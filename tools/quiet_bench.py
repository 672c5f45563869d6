#!/usr/bin/env python3
"""Steal%-gated bench capture: only launch (and only ACCEPT) a Bench run
inside a clean host window.

Round-15 problem this solves: all five manual re-lock attempts over ~4h
landed in co-tenant steal waves and were machine-adjudicated dirty AFTER
the fact (compare_bench probe p90 >= 1.5). This wrapper moves that
judgment to capture time:

  1. PRE-GATE  — poll /proc/stat steal% + /proc/loadavg until a
     sustained clean span (every tick under --steal-max, load1 under
     --load-max) of --pre-window seconds is observed.
  2. CAPTURE   — launch `sbt -batch "runMain graft.Bench"` with the
     requested sf/cpus env; sample steal% every tick during the run.
  3. MID-RUN ABORT — if a sliding 30 s window of steal% exceeds
     --abort-steal, kill the run immediately (no point finishing a
     capture the probe will reject) and retry after backoff.
  4. POST-ADJUDICATE — require BOTH the artifact's own meta.steal_pct
     under --steal-max-run AND compare_bench.py's probe verdict on it
     to be CLEAN (task-ratio p90 < 1.5 vs the locked baseline).
     Artifacts that complete but fail either gate are kept as
     OUT.dirtyN.json for forensics and never returned as the result.

Usage:
  quiet_bench.py OUT.json [--sf /root/testdata/sf0.1] [--cpus 32]
      [--attempts 4] [--pre-window 24] [--steal-max 0.8]
      [--abort-steal 3.0] [--steal-max-run 0.8] [--load-max 2.0]
      [--driver-mem 16g] [--deadline-min 240] [--baseline OLD.json]

The pre-gate is deliberately looser than the accept gate: this host's
co-tenant steal arrives in second-scale waves, and demanding a long
all-quiet span before launching wastes more wall clock than a rejected
capture does. The POST gates (meta.steal_pct and the probe p90) are
what a committed lock must pass.

Exit 0 + "ACCEPTED" line only when a clean artifact landed at OUT.json.
"""
import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def jiffies():
    with open("/proc/stat") as f:
        p = f.readline().split()[1:]
    p = list(map(int, p))
    return p[7], sum(p)  # steal, total


def load1():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def steal_between(a, b):
    ds, dt = b[0] - a[0], b[1] - a[1]
    return 100.0 * ds / dt if dt > 0 else 0.0


def loaded_steal(cpus, secs=12.0):
    """Steal%% measured UNDER full synthetic load on `cpus` cores.

    Round-14 (opt-1) failure mode the idle pre-gate cannot see: on an
    overcommitted host, idle-tick steal can sit at 0.0-0.3%% while steal
    under load is 3-6%% — the co-tenant only contends when we actually
    want the CPU. Every capture launched through the idle-only pre-gate
    that morning burned a 2-minute sbt startup and then aborted at
    103-144 s (the first post-warmup abort window). A 12 s spin probe
    predicts the loaded-steal verdict for ~1%% of that cost.
    """
    import multiprocessing

    def _spin(sec):
        end = time.time() + sec
        while time.time() < end:
            pass

    procs = [multiprocessing.Process(target=_spin, args=(secs,))
             for _ in range(cpus)]
    for p in procs:
        p.start()
    time.sleep(2.0)  # let the load establish before sampling
    a = jiffies()
    time.sleep(max(1.0, secs - 4.0))
    b = jiffies()
    for p in procs:
        p.join()
    return steal_between(a, b)


def pre_gate(args, deadline):
    """Block until a clean span of --pre-window seconds; True if found."""
    tick = 3.0
    need = max(1, int(args.pre_window / tick))
    ok = 0
    prev = jiffies()
    while time.time() < deadline:
        time.sleep(tick)
        cur = jiffies()
        s, l1 = steal_between(prev, cur), load1()
        prev = cur
        if s < args.steal_max and l1 < args.load_max:
            ok += 1
            if ok >= need:
                print(f"[quiet] pre-gate clean: {need} ticks "
                      f"steal<{args.steal_max}% load1<{args.load_max}")
                # Idle-clean is necessary but not sufficient: confirm the
                # host stays clean when WE are the load (see loaded_steal).
                ls = loaded_steal(args.cpus)
                if ls < args.probe_steal_max:
                    print(f"[quiet] loaded-steal probe clean: {ls:.2f}% "
                          f"< {args.probe_steal_max}%")
                    return True
                print(f"[quiet] loaded-steal probe DIRTY: {ls:.2f}% >= "
                      f"{args.probe_steal_max}% — not launching")
                ok = 0
        else:
            if ok:
                print(f"[quiet] pre-gate reset at {ok}/{need} "
                      f"(steal {s:.2f}% load1 {l1:.2f})")
            ok = 0
    return False


def run_capture(args, tmp_out):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=args.sf,
               SPARK_GRAFT_CPUS=str(args.cpus),
               SPARK_GRAFT_BENCH_OUT=tmp_out)
    if args.driver_mem:
        env["SPARK_DRIVER_MEM"] = args.driver_mem
    proc = subprocess.Popen(
        ["sbt", "-batch", "runMain graft.Bench"], cwd=ROOT, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    # Sliding 30s steal monitor; abort if sustained contention appears.
    # The first --warmup seconds are exempt: sbt/JVM startup bursts all
    # cores and on an overcommitted host that SELF-INDUCES steal spikes
    # before the timed loop has even begun (observed: every abort in the
    # first capture attempts fired 70-110s in, i.e. during startup).
    # Bench's own meta.steal_pct brackets exactly the timed loop, so the
    # accept gate still catches a genuinely dirty run.
    tick, win = 3.0, []
    start = time.time()
    prev = jiffies()
    while proc.poll() is None:
        time.sleep(tick)
        cur = jiffies()
        win.append(steal_between(prev, cur))
        prev = cur
        win = win[-10:]
        if time.time() - start > args.warmup and len(win) == 10:
            w = sum(win) / len(win)
            if w > args.abort_steal:
                print(f"[quiet] MID-RUN ABORT: 30s steal {w:.2f}% > "
                      f"{args.abort_steal}% — killing capture")
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                return "aborted"
    if proc.returncode != 0:
        return f"sbt exit {proc.returncode}"
    return None  # completed


def adjudicate(args, tmp_out):
    """Return (ok, detail). ok only on meta-steal clean + probe CLEAN."""
    j = json.load(open(tmp_out))
    st = j.get("meta", {}).get("steal_pct")
    if st is None or st > args.steal_max_run:
        return False, f"meta.steal_pct {st}% > {args.steal_max_run}%"
    cmd = [sys.executable, os.path.join(ROOT, "tools", "compare_bench.py")]
    if args.baseline:
        cmd.append(args.baseline)
    cmd.append(tmp_out)
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    out = r.stdout + r.stderr
    m = re.search(r"p90 ([0-9.]+) over \d+ queries -> (\w[\w ]*)", out)
    if not m:
        # No probe overlap (e.g. first-ever lock at a new config):
        # fall back to the artifact's own steal gate, already passed.
        return True, f"steal {st}% (no probe adjudication available)\n{out}"
    p90, verdict = float(m.group(1)), m.group(2).strip()
    ok = p90 < 1.5
    return ok, (f"steal {st}%  probe p90 {p90} -> "
                f"{'CLEAN' if ok else verdict}\n{out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--attempts", type=int, default=4)
    ap.add_argument("--pre-window", type=float, default=24)
    ap.add_argument("--steal-max", type=float, default=0.8)
    ap.add_argument("--abort-steal", type=float, default=3.0)
    ap.add_argument("--warmup", type=float, default=100,
                    help="seconds after launch exempt from the abort "
                         "monitor (sbt/JVM startup self-induces steal)")
    ap.add_argument("--steal-max-run", type=float, default=0.8)
    ap.add_argument("--probe-steal-max", type=float, default=1.5,
                    help="max steal%% under a 12s full-load spin probe "
                         "after the idle pre-gate (idle-clean windows "
                         "can be loaded-dirty on an overcommitted host)")
    ap.add_argument("--load-max", type=float, default=2.0)
    ap.add_argument("--driver-mem", default=None)
    ap.add_argument("--deadline-min", type=float, default=240)
    ap.add_argument("--baseline", default=None,
                    help="explicit OLD.json for compare_bench (else its "
                         "locked default for the artifact's cpus/sf)")
    args = ap.parse_args()
    deadline = time.time() + args.deadline_min * 60
    for attempt in range(1, args.attempts + 1):
        if time.time() >= deadline:
            break
        print(f"[quiet] attempt {attempt}/{args.attempts} "
              f"(sf={args.sf} cpus={args.cpus})")
        if not pre_gate(args, deadline):
            print("[quiet] deadline hit waiting for a clean span")
            break
        tmp = args.out + f".attempt{attempt}"
        t0 = time.time()
        err = run_capture(args, tmp)
        dur = time.time() - t0
        if err:
            print(f"[quiet] attempt {attempt} failed after {dur:.0f}s: {err}")
            if os.path.exists(tmp):
                os.rename(tmp, args.out + f".dirty{attempt}.json")
            time.sleep(30)
            continue
        ok, detail = adjudicate(args, tmp)
        print(f"[quiet] attempt {attempt} finished in {dur:.0f}s: {detail}")
        if ok:
            os.rename(tmp, args.out)
            print(f"[quiet] ACCEPTED -> {args.out}")
            return 0
        os.rename(tmp, args.out + f".dirty{attempt}.json")
        print(f"[quiet] rejected; kept as {args.out}.dirty{attempt}.json")
        time.sleep(30)
    print("[quiet] NO CLEAN CAPTURE within attempts/deadline")
    return 1


if __name__ == "__main__":
    sys.exit(main())
