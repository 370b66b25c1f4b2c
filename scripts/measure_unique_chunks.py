"""Per-chunk REDUCE unique-row counts across the WHOLE compacted
sample buffer (sizes --eloc-dedup-max for the round-3 run: the static
dedup capacity must cover the worst chunk, and late chunks of rarer
states overlap less than chunk 0).

CPU-safe (forced cpu platform; the TPU stays free for training).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from pynqs_tpu.energy.eloc import reduce_unique_count
from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count
from pynqs_tpu.utils import System
from pynqs_tpu.utils.checkpoint import load_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CKPT = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/fe2s2_r3_dcut96_a_resume.pkl"
N = int(float(sys.argv[2])) if len(sys.argv) > 2 else 10_000_000
MAX_UNIQUE = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
B = int(sys.argv[4]) if len(sys.argv) > 4 else 4096

sys_ = System.from_pth(
    "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
)
model = GraphMPSRNN(
    sys_.sorb, sys_.noa, sys_.nob, dcut=96,
    phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
)
ck = load_params(os.path.join(REPO, CKPT))
if isinstance(ck, dict) and "params" in ck:
    ck = ck["params"]
params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), ck)

t0 = time.time()
bits, counts, dropped = ar_sampling_dfs(
    model, params, jax.random.PRNGKey(5), N, capacity=4096, n_group=8,
    split_depth=8, capacity_root=4096,
)
live = int((np.asarray(counts) > 0).sum())
print(
    f"DFS n={N:.0e} G=8 cap=4096 d=8: live={live} "
    f"dropped={float(dropped) / N * 100:.4f}%  [{time.time() - t0:.0f}s]",
    flush=True,
)
bits_c, counts_c = compact_by_count(bits, counts, MAX_UNIQUE)[:2]
kept = int(np.asarray(counts_c).sum())
print(f"compacted to {MAX_UNIQUE}: kept mass {kept / N * 100:.4f}%", flush=True)

t = sys_.tables
ops = tuple(jnp.asarray(np.asarray(x), jnp.float64) for x in t.astuple())
hpair = None if t.hpair is None else jnp.asarray(np.asarray(t.hpair), jnp.float64)

t0 = time.time()
nu = np.asarray(
    reduce_unique_count(
        bits_c, ops, sys_.excitation, jax.random.PRNGKey(9),
        k_det=512, n_stoch=128, batch=B, hpair=hpair,
    )
)
rows = B * (1 + 512 + 128)
print(f"per-chunk unique rows (B={B}, rows/chunk={rows}) [{time.time() - t0:.0f}s]:")
for i, n in enumerate(nu):
    print(f"  chunk {i}: {n} ({n / rows * 100:.1f}%)")
print(f"max: {nu.max()}  -> dedup capacity >= {int(nu.max() * 1.2)}")
