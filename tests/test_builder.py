"""Robot-builder environment tests (reference: src/robot_builder/*)."""

import numpy as np

from evomotion_tpu.builder.builder_env import RobotBuilderEnvironment


def _quat_identity():
    return np.array([0.0, 0.0, 0.0, 1.0], np.float32)


def _make_two_member_robot():
    b = RobotBuilderEnvironment("bot")
    assert b.add_member("torso", "cube", (0, 1, 0), _quat_identity(), (0.5, 0.2, 0.3), 2.0, 0.5)
    assert b.add_member("leg", "cube", (0.5, 0.5, 0), _quat_identity(), (0.1, 0.4, 0.1), 0.5, 0.5)
    assert b.set_root("torso")
    assert b.attach_hinge_constraint(
        "hip", "torso", "leg", (0.5, 1.0, 0.0), (0, 0, 1), -0.5, 0.5
    )
    return b


def test_add_update_and_bfs_propagation():
    b = _make_two_member_robot()
    # moving the torso +1 in x drags the leg along (BFS through the graph)
    leg_before = b.get_member_transform("leg")[0].copy()
    assert b.update_member("torso", new_pos=(1.0, 1.0, 0.0))
    leg_after = b.get_member_transform("leg")[0]
    np.testing.assert_allclose(leg_after, leg_before + np.array([1.0, 0, 0]), atol=1e-5)
    # constraint pivot followed too
    pivot, axis, lo, hi = b.get_constraint_hinge_info("hip")
    np.testing.assert_allclose(pivot, [1.5, 1.0, 0.0], atol=1e-5)


def test_duplicate_and_missing_rules():
    b = _make_two_member_robot()
    assert not b.add_member("torso", "cube", (0, 0, 0), _quat_identity(), (1, 1, 1), 1, 0.5)
    assert not b.attach_hinge_constraint("hip", "torso", "leg", (0, 0, 0), (0, 0, 1))
    assert not b.update_member("nope", new_pos=(0, 0, 0))
    assert not b.remove_member("nope")


def test_rename_and_remove():
    b = _make_two_member_robot()
    assert b.rename_member("leg", "left_leg")
    assert b.member_exists("left_leg") and not b.member_exists("leg")
    assert b.get_constraint_members("hip") == ("torso", "left_leg")
    # removing a member removes its constraints
    assert b.remove_member("left_leg")
    assert not b.constraint_exists("hip")
    assert b.get_members_count() == 1


def test_clone_body_part():
    b = _make_two_member_robot()
    assert b.clone_body_part("leg", "c", (0.5, 0.5, 0.4), _quat_identity())
    assert b.member_exists("c_leg")
    pos, _, _ = b.get_member_transform("c_leg")
    np.testing.assert_allclose(pos, [0.5, 0.5, 0.4], atol=1e-5)


def test_muscles_and_save_load(tmp_path):
    b = _make_two_member_robot()
    assert b.add_muscle("m0", "torso", "leg", (0.4, 0, 0), (0, 0.3, 0))
    assert not b.add_muscle("m0", "torso", "leg", (0, 0, 0), (0, 0, 0))
    path = str(tmp_path / "bot.json")
    b.save_robot(path)

    b2 = RobotBuilderEnvironment()
    b2.load_robot(path)
    assert b2.get_robot_name() == "bot"
    assert b2.get_root_name() == "torso"
    assert b2.get_member_names() == ["torso", "leg"]
    assert b2.muscle_exists("m0")
    pivot, axis, lo, hi = b2.get_constraint_hinge_info("hip")
    np.testing.assert_allclose(pivot, [0.5, 1.0, 0.0], atol=1e-5)
    assert (lo, hi) == (-0.5, 0.5)


def test_compiles_to_physics_model():
    b = _make_two_member_robot()
    b.add_muscle("m0", "torso", "leg", (0.4, 0, 0), (0, 0.3, 0))
    model, meta = b.compile()
    assert model.n_hinge == 1 and model.n_slider == 1 and model.n_p2p == 2
    assert meta.action_dim == 1
    assert meta.obs_dim == 2 * 19 + 4


def test_ray_cast():
    b = _make_two_member_robot()
    # ray straight down onto the torso (half extents 0.5, 0.2, 0.3 at (0,1,0))
    assert b.ray_cast_member((0, 3, 0), (0, -1, 0)) == "torso"
    # ray that misses everything
    assert b.ray_cast_member((10, 3, 10), (10, 2, 10)) is None
    # ray at the hinge marker
    assert b.ray_cast_constraint((0.5, 3.0, 0.0), (0.5, -1.0, 0.0)) == "hip"
