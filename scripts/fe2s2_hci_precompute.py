"""Precompute a heat-bath selected-CI space for the Fe2S2 NqsCi run.

Runs entirely on CPU (x64) so it can proceed while the TPU trains the
flagship: grows an HCI space from the HF determinant with
``ci.selected.selected_ci`` (in-repo DICE/SHCI analog; reference shells
out to the DICE binary, utils/pyscf_helper/dice_pyscf.py:22) and saves
it via ``ci.solve.save_ci`` for ``fe2s2_nqsci_train.py --ci-file``.

  PYNQS_PLATFORM=cpu nice -n 19 python scripts/fe2s2_hci_precompute.py \
      --max-space 4096 --eps1 1e-4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps1", type=float, default=1e-4)
    ap.add_argument("--max-space", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--max-rounds", type=int, default=20)
    ap.add_argument("--eps2", type=float, default=None,
                    help="also compute deterministic EN-PT2 (slow)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    os.environ.setdefault("PYNQS_PLATFORM", "cpu")
    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    jax.config.update("jax_enable_x64", True)

    from pynqs_tpu.ci.selected import selected_ci
    from pynqs_tpu.ci.solve import save_ci
    from pynqs_tpu.utils.flagship import fe2s2_system

    sys_ = fe2s2_system(np.float64)
    t0 = time.time()
    e_var, ci, info = selected_ci(
        sys_, eps1=args.eps1, max_space=args.max_space,
        max_rounds=args.max_rounds, chunk=args.chunk,
        eps2=args.eps2, verbose=True,
    )
    dt = time.time() - t0
    m = int(ci.bits.shape[0])
    out = args.out or os.path.join(REPO, f"checkpoints/fe2s2_hci_m{m}.npz")
    save_ci(out, ci, e_var=e_var, eps1=args.eps1,
            rounds=info["rounds"], seconds=dt)
    print(f"\nHCI m={m}  E_var = {e_var:.8f} Ha "
          f"({(e_var - sys_.e_ref) * 1000:+.3f} mHa vs e_ref)  "
          f"rounds={info['rounds']}  t={dt:.0f}s")
    if "e_total" in info:
        print(f"  +PT2: {info['e_total']:.8f} Ha "
              f"({(info['e_total'] - sys_.e_ref) * 1000:+.3f} mHa)")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
