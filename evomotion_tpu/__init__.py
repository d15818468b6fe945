"""evomotion_tpu — a TPU-native framework for teaching simulated creatures to move.

A from-scratch JAX/XLA re-creation of the capabilities of Ipsedo/EvoMotion
(reference: C++20, Bullet3 physics + LibTorch RL + OpenGL view). Instead of a
multithreaded CPU rigid-body world stepped one environment at a time, this
framework runs thousands of environments in lockstep as batched, statically
shaped array programs compiled by XLA, with RL agents expressed as pure
functional updates over parameter pytrees, sharded across TPU meshes with
`jax.sharding` / `shard_map`.

Layer map (mirrors reference layers, re-designed TPU-first):
  physics/   — batched rigid-body engine (reference: Bullet3 + evo_motion_model)
  envs/      — cartpole, cartpole3d, robot_walk, robot_jump (reference: src/env/*)
  networks/  — MLP / liquid (LTC) modules, truncated-normal policy
               (reference: evo_motion_networks/src/networks/*)
  agents/    — PPO-GAE/vanilla, A2C, SAC, CrossQ (+ liquid variants)
               (reference: evo_motion_networks/src/agents/*)
  buffers/   — device ring/trajectory replay buffers (reference: replay_buffer.h)
  train/     — trainers, metrics, checkpointing (reference: src/train.cpp, saver.h)
  parallel/  — device-mesh sharding of the training step (reference: none; new)
  serialize/ — bit-exact JSON robot (de)serialization (reference: json_serializer.cpp)
  viewer/    — headless trajectory recording/rendering (reference: evo_motion_view)
  builder/   — robot-builder environment API (reference: src/robot_builder/*)
"""

__version__ = "0.1.0"
