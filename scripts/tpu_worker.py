#!/usr/bin/env python
"""Persistent TPU job worker: claim the chip ONCE, then exec queued jobs.

The axon pool claim costs 2-15 minutes per process (CLAUDE.md), so perf
sessions that would each pay it are run instead as job files dropped into
a queue directory and exec'd in this long-lived process:

    python scripts/tpu_worker.py  # claims, then polls NGS_JOB_DIR

    # enqueue: write a .py file into $NGS_JOB_DIR/queue/
    # results: stdout/err + status in $NGS_JOB_DIR/done/<name>.{out,err,rc}
    # stop:    touch $NGS_JOB_DIR/STOP

Jobs run with globals {"WORKER": True}; exceptions are caught and logged
so one bad job never costs the claim.  Jobs in the queue run in sorted
filename order.
"""

import io
import json
import os
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

JOB_DIR = os.environ.get("NGS_JOB_DIR", "/tmp/tpu_jobs")
QUEUE = os.path.join(JOB_DIR, "queue")
DONE = os.path.join(JOB_DIR, "done")
STOP = os.path.join(JOB_DIR, "STOP")


def log(msg):
    print(f"[worker] {time.strftime('%H:%M:%S')} {msg}", flush=True)


def main():
    os.makedirs(QUEUE, exist_ok=True)
    os.makedirs(DONE, exist_ok=True)
    if os.path.exists(STOP):
        os.remove(STOP)

    from ngs_barcode_count_tpu.utils.claim import claim_devices

    log("claiming TPU (bounded retry)...")
    t0 = time.time()
    claim_devices(max_attempts=8, total_sleep_budget_s=2400)
    import jax

    plat = jax.devices()[0].platform
    log(f"claimed {jax.devices()} in {time.time() - t0:.0f}s")
    if plat == "cpu":
        log("WARNING: claimed CPU, not TPU")
    from ngs_barcode_count_tpu.runner import _enable_compile_cache

    _enable_compile_cache()

    with open(os.path.join(JOB_DIR, "READY"), "w") as f:
        f.write(f"{plat} {time.strftime('%H:%M:%S')}\n")

    log(f"polling {QUEUE}")
    while not os.path.exists(STOP):
        jobs = sorted(
            f for f in os.listdir(QUEUE) if f.endswith(".py")
        )
        if not jobs:
            time.sleep(2)
            continue
        name = jobs[0]
        path = os.path.join(QUEUE, name)
        running = os.path.join(JOB_DIR, "RUNNING")
        with open(running, "w") as f:
            f.write(name + "\n")
        log(f"running {name}")
        with open(path) as f:
            src = f.read()
        out_buf, err_buf = io.StringIO(), io.StringIO()
        rc = 0
        t0 = time.time()
        try:
            code = compile(src, path, "exec")
            g = {"WORKER": True, "__name__": "__tpu_job__",
                 "__file__": path}
            with redirect_stdout(out_buf), redirect_stderr(err_buf):
                exec(code, g)
        except SystemExit as e:
            rc = int(e.code or 0)
        except Exception:
            rc = 1
            err_buf.write(traceback.format_exc())
        dt = time.time() - t0
        base = os.path.join(DONE, name[:-3])
        with open(base + ".out", "w") as f:
            f.write(out_buf.getvalue())
        with open(base + ".err", "w") as f:
            f.write(err_buf.getvalue())
        with open(base + ".rc", "w") as f:
            json.dump({"rc": rc, "seconds": round(dt, 1)}, f)
        os.rename(path, base + ".py")
        os.remove(running)
        log(f"done {name}: rc={rc} in {dt:.0f}s")
    log("STOP seen; releasing")
    os.remove(STOP)


if __name__ == "__main__":
    main()
