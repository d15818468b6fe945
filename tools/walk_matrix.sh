#!/bin/bash
# PPO knob matrix on robot_walk (VERDICT r3 #1 prong b): short ~50M-step runs
# over obs_norm x entropy decay x sigma annealing x horizon, each with
# config.json provenance next to its curve. Run AFTER/alongside the CrossQ
# prong; scale the winner.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
S=${1:-1234}
I=763      # 50M steps at 1024 envs x horizon 64
I256=191   # 50M steps at horizon 256

run() { echo "=== $* ==="; timeout 2400 python tools/train_walk.py "$@" \
          --seed "$S" --n-envs 1024 --save-every 100000 --eval-every 100; }

run runs/m_norm_ent      --iters $I --obs-norm 1 --entropy-steps 400
run runs/m_norm_sig      --iters $I --obs-norm 1 --sigma-end 0.3 --sigma-steps 400
run runs/m_norm_ent_sig  --iters $I --obs-norm 1 --entropy-steps 400 --sigma-end 0.3 --sigma-steps 400
run runs/m_ent_sig       --iters $I --entropy-steps 400 --sigma-end 0.3 --sigma-steps 400
run runs/m_norm_h256     --iters $I256 --horizon 256 --obs-norm 1 --entropy-steps 100
run runs/m_norm_h256_sig --iters $I256 --horizon 256 --obs-norm 1 --entropy-steps 100 --sigma-end 0.3 --sigma-steps 100
echo MATRIX_DONE
