"""Round-3 sizing measurements on the trained Fe2S2 dcut=96 state:

1. live branch count per AR depth (picks dfs split_depth),
2. DFS dropped mass vs the round-2 slab scheme's 0.73% at n=1e6,
3. unique determinant count at n=1e7 (sizes max_unique / eloc buffer).

One TPU client at a time (CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
from pynqs_tpu.sampler.ar import _ar_steps, ar_sampling_dfs
from pynqs_tpu.utils import System
from pynqs_tpu.utils.checkpoint import load_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys_ = System.from_pth(
    "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
)
model = GraphMPSRNN(
    sys_.sorb, sys_.noa, sys_.nob, dcut=96,
    phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
)
params = load_params(os.path.join(REPO, "checkpoints/fe2s2_r2_dcut96_final.pkl"))
params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
print("backend:", jax.default_backend(), flush=True)

n_steps = sys_.sorb // 2
site_order = list(model.site_order)


def live_per_depth(params, key, n_sample, C, depth):
    bits = jnp.zeros((C, sys_.sorb), dtype=jnp.int8)
    counts = jnp.zeros((C,), dtype=jnp.int32).at[0].set(n_sample)
    z = jnp.zeros((C,), dtype=jnp.int32)
    carry = model.ar_init(params, C)
    state = (bits, counts, z, z, z, carry)
    lives = []
    for k in range(depth):
        state = _ar_steps(
            model, params, key, state, k, k + 1, site_order,
            max_count=n_sample,
        )
        lives.append((state[1] > 0).sum())
    return jnp.stack(lives)


t0 = time.time()
fn = jax.jit(live_per_depth, static_argnums=(2, 3, 4))
lives = np.asarray(fn(params, jax.random.PRNGKey(0), 10_000_000, 16384, 12))
print(f"live branches per depth (n=1e7, root 16384) [{time.time()-t0:.0f}s]:")
for k, lv in enumerate(lives):
    print(f"  depth {k + 1:2d}: {lv}")

for n, root, depth, G, cap in [
    (1_000_000, 8192, 6, 8, 4096),
    (10_000_000, 16384, 7, 8, 4096),
    (10_000_000, 16384, 7, 16, 4096),
]:
    t0 = time.time()
    fn = jax.jit(
        lambda p, k: ar_sampling_dfs(
            model, p, k, n, capacity=cap, n_group=G,
            split_depth=depth, capacity_root=root,
        )
    )
    bits, counts, dropped = fn(params, jax.random.PRNGKey(1))
    jax.block_until_ready(counts)
    t_compile = time.time() - t0
    t0 = time.time()
    bits, counts, dropped = fn(params, jax.random.PRNGKey(2))
    jax.block_until_ready(counts)
    dt = time.time() - t0
    live = int((np.asarray(counts) > 0).sum())
    dr = float(dropped) / n * 100
    print(
        f"DFS n={n:.0e} root={root} depth={depth} G={G} cap={cap}: "
        f"dropped {dr:.4f}%  live {live}  t={dt:.2f}s "
        f"(compile {t_compile:.0f}s)",
        flush=True,
    )
