"""Robot JSON codec tests: bit-exact float round-trips (json_serializer.cpp)."""

import math

import numpy as np

from evomotion_tpu.serialize import robot
from evomotion_tpu.serialize.codec import binary_string_to_float, float_to_binary_string

SPIDER = "evomotion_tpu/resources/skeleton/spider.json"


def test_codec_known_values():
    assert float_to_binary_string(0.5) == "00111111000000000000000000000000"
    assert float_to_binary_string(2.0) == "01000000000000000000000000000000"
    assert float_to_binary_string(-1.0) == "10111111100000000000000000000000"
    assert binary_string_to_float("01000001000000000000000000000000") == 8.0


def test_codec_roundtrip_bit_exact():
    rng = np.random.default_rng(0)
    vals = list(rng.normal(size=100).astype(np.float32)) + [
        np.float32(0.0), np.float32(-0.0), np.float32(np.inf), np.float32(1e-40)
    ]
    for v in vals:
        s = float_to_binary_string(float(v))
        assert len(s) == 32
        back = np.float32(binary_string_to_float(s))
        assert back.tobytes() == np.float32(v).tobytes()
    # NaN round-trips bit-exactly too
    s = float_to_binary_string(float("nan"))
    assert math.isnan(binary_string_to_float(s))


def test_spider_loads():
    spec = robot.load(SPIDER)
    assert spec.root_name == "body"
    assert len(spec.members) == 17
    assert len(spec.constraints) == 16
    assert len(spec.muscles) == 12
    kinds = [type(c).__name__ for c in spec.constraints]
    assert kinds.count("HingeSpec") == 12
    assert kinds.count("FixedSpec") == 4


def test_spider_roundtrip_bit_exact(tmp_path):
    spec = robot.load(SPIDER)
    p = tmp_path / "spider2.json"
    robot.save(str(p), spec)
    spec2 = robot.load(str(p))
    for m1, m2 in zip(spec.members, spec2.members):
        assert m1.name == m2.name
        assert np.asarray(m1.translation).tobytes() == np.asarray(m2.translation).tobytes()
        assert np.asarray(m1.rotation).tobytes() == np.asarray(m2.rotation).tobytes()
        assert np.float32(m1.mass).tobytes() == np.float32(m2.mass).tobytes()
    for mu1, mu2 in zip(spec.muscles, spec2.muscles):
        assert np.float32(mu1.force).tobytes() == np.float32(mu2.force).tobytes()
        assert np.asarray(mu1.pos_in_a).tobytes() == np.asarray(mu2.pos_in_a).tobytes()


def test_spider_compiles_to_reference_shapes():
    from evomotion_tpu.physics.robot_compiler import compile_robot

    spec = robot.load(SPIDER)
    model, meta = compile_robot(spec)
    # SURVEY/BASELINE workload shape: 17 members + 24 attach bodies + floor,
    # 12 hinges + 4 fixed + 12 sliders + 24 p2p, obs 371, act 12
    assert model.n_bodies == 42
    assert model.n_hinge == 12 and model.n_fixed == 4
    assert model.n_slider == 12 and model.n_p2p == 24
    assert meta.obs_dim == 371
    assert meta.action_dim == 12
