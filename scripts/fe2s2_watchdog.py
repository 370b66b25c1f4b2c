"""Watchdog for the long Fe2S2 flagship runs on the axon tunnel.

The tunnel occasionally wedges a client mid-dispatch (the process
futex-waits forever while the chip is actually reachable from a fresh
client).  This supervisor launches scripts/fe2s2_r3_push.py and, when
the run log goes stale, kills and relaunches it from the latest
checkpoint — recomputing --iters and the absolute-iteration clip
stages from the checkpoint's history length (VMC.run restarts its
iteration counter at 0 on resume).

  python scripts/fe2s2_watchdog.py --tag ref --total-iters 5000 \
      --clip-stages 0:0.1,3000:0.01,4000:0.001 -- [extra push args...]
"""

import argparse
import os
import pickle
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def history_len(ckpt_path: str) -> int:
    with open(ckpt_path, "rb") as fh:
        ck = pickle.load(fh)
    return len(ck.get("history", ()))


def shifted_stages(stages: str, done: int) -> str:
    out = []
    prev_v = None
    for part in stages.split(","):
        it_s, v_s = part.split(":")
        it = max(0, int(it_s) - done)
        if out and it == 0:
            out[-1] = f"0:{v_s}"  # later stage already reached
        else:
            out.append(f"{it}:{v_s}")
        prev_v = v_s
    del prev_v
    return ",".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="ref")
    ap.add_argument("--dcut", type=int, default=20)
    ap.add_argument("--total-iters", type=int, default=5000)
    ap.add_argument("--clip-stages", default="0:0.1,3000:0.01,4000:0.001")
    ap.add_argument("--stale-secs", type=int, default=600)
    ap.add_argument("--poll-secs", type=int, default=60)
    ap.add_argument("rest", nargs="*", help="extra args for fe2s2_r3_push.py")
    args = ap.parse_args()

    tag = f"dcut{args.dcut}_{args.tag}"
    log = os.path.join(REPO, f"logs/fe2s2_r3_{tag}.log")
    resume = os.path.join(REPO, f"checkpoints/fe2s2_r3_{tag}_resume.pkl")
    out = open(f"/tmp/fe2s2_r3_{args.tag}.out", "ab", buffering=0)

    def launch():
        done = history_len(resume) if os.path.exists(resume) else 0
        if done >= args.total_iters:
            return None, done
        cmd = [
            sys.executable, os.path.join(REPO, "scripts/fe2s2_r3_push.py"),
            "--dcut", str(args.dcut), "--tag", args.tag,
            "--iters", str(args.total_iters - done),
            "--clip-stages", shifted_stages(args.clip_stages, done),
        ] + list(args.rest)
        if done > 0:
            cmd += ["--resume", resume]
        print(f"[watchdog] launch (done={done}): {' '.join(cmd)}", flush=True)
        # reset staleness so a (re)compile window isn't mistaken for a
        # hang; --stale-secs must exceed compile + first log interval
        os.makedirs(os.path.dirname(log), exist_ok=True)
        with open(log, "a"):
            os.utime(log, None)
        p = subprocess.Popen(cmd, stdout=out, stderr=out, cwd=REPO)
        return p, done

    proc, _ = launch()
    if proc is None:
        print("[watchdog] already complete", flush=True)
        return
    while True:
        time.sleep(args.poll_secs)
        rc = proc.poll()
        if rc is not None:
            done = history_len(resume) if os.path.exists(resume) else 0
            if rc == 0 and done >= args.total_iters - 1:
                print(f"[watchdog] finished rc=0 done={done}", flush=True)
                return
            print(f"[watchdog] exited rc={rc} done={done}; relaunching",
                  flush=True)
            time.sleep(10)
            proc, _ = launch()
            if proc is None:
                return
            continue
        stale = time.time() - os.path.getmtime(log) if os.path.exists(log) else 0.0
        if stale > args.stale_secs:
            print(f"[watchdog] log stale {stale:.0f}s — killing pid "
                  f"{proc.pid}", flush=True)
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            time.sleep(15)
            proc, _ = launch()
            if proc is None:
                return


if __name__ == "__main__":
    main()
