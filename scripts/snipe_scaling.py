#!/usr/bin/env python3
"""Window-sniper for the N->4N scaling pair on a bandwidth-throttled host.

This sandbox VM's memory bandwidth is externally throttled most of the
time (<1 GB/s aggregate) with brief, unpredictable healthy windows
(20-40 GB/s). A scaling pair measured across a window boundary is
meaningless (BENCH/BASELINE.md section 2b documents several such polluted
pairs, unredacted). Idle time does NOT refill the budget (measured:
15.7 GB/s -> 0.4 GB/s after 150 s idle), so the only strategy left is to
poll cheaply and fire the pair the moment a window opens.

Loop:
  1. gate-probe aggregate copy bandwidth at 4 processes (~2 s). A
     16-process probe is NOT part of the gate: pure-memcpy at 16 procs
     collapses to ~1 GB/s on this host even in windows where a 4-proc
     probe reads 40-60 GB/s seconds apart (measured both orders) - a
     concurrency throttle the mixed compute/memory build does not hit.
  2. if bw4 >= GATE_ABS_GBPS, fire scripts/run_scaling.sh with RUNS=1
     (single run per level, ~3-4 min total, to fit inside the window)
  3. validate the pair post-hoc with the run's own bracketing 4-proc
     probes: both levels must have seen healthy bandwidth around their
     builds (membw_N and membw_4N >= 8 GB/s)
  4. append every guard-passing pair to RESULT+'l' (.jsonl) and keep
     polling until MAX_HOURS — one pair in a flapping substrate regime
     is not representative; the round report shows all of them (any
     efficiency - honesty over cherry-picking)

Results append to /tmp/scaling_sniper.log; the final valid pair lands in
/tmp/scaling_sniper_result.json.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_job import host_membw_probe  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = "/tmp/scaling_sniper.log"
RESULT = "/tmp/scaling_sniper_result.json"
GATE_ABS_GBPS = 10.0
MAX_HOURS = float(os.environ.get("SNIPE_MAX_HOURS", "3.5"))
POLL_SEC = float(os.environ.get("SNIPE_POLL_SEC", "210"))


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def gate() -> float:
    # refuse to fire while OTHER work is loading the box (a concurrent
    # Spark job slows one leg and fakes the efficiency in either
    # direction); the bandwidth probe alone cannot see CPU contention.
    # Both the 1- and 5-minute averages must be low: bursty workloads
    # (a Spark session mid-startup) dip the 1-min value below the bar
    # for long enough to slip a one-instant sample
    if max(os.getloadavg()[:2]) > 4.0:
        return 0.0
    return host_membw_probe(4, seconds=2.0)


def fire() -> dict | None:
    env = dict(os.environ, RUNS="1", N_CORES="4", OUT_BASE="/dev/shm")
    try:
        p = subprocess.run(
            ["bash", "scripts/run_scaling.sh",
             "/root/testdata/sf0.1", "96", "4"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
        )
    except subprocess.TimeoutExpired:
        # the window collapsing mid-pair can slow the build many-fold;
        # a hung pair must not kill the remaining hours of sniping
        log("pair TIMED OUT after 1200s (window collapse mid-run); continuing")
        return None
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not lines:
        log(f"pair FAILED rc={p.returncode}: {p.stderr[-300:]}")
        return None
    summary = json.loads(lines[-1])
    log(f"pair: {json.dumps(summary)}")
    return summary


def valid(s: dict) -> bool:
    m_n = s.get("membw_gb_per_sec_N") or 0
    m_4n = s.get("membw_gb_per_sec_4N") or 0
    if not (m_n >= 8.0 and m_4n >= 8.0):
        return False
    # both legs healthy is not enough: a window half-closing mid-pair
    # (e.g. 45 -> 21 GB/s, measured) starves only the 4N leg and fakes a
    # low efficiency. Require the two legs to have seen comparable hosts.
    drift = m_4n / m_n if m_n else 0.0
    if not (0.6 <= drift <= 1.67):
        return False
    # and the pair's own bracketing CPU probes must read a near-clean
    # box: a concurrent local job slipping past the loadavg gate slows
    # the N leg and INFLATES efficiency (measured: a 0.838 raw pair
    # with ceiling 0.833 during a test-suite run, N-leg 43% below its
    # clean-window rate)
    return (s.get("host_ceiling_efficiency") or 0) >= 0.9


def main() -> int:
    deadline = time.time() + MAX_HOURS * 3600
    attempt = captured = 0
    while time.time() < deadline:
        bw4 = gate()
        healthy = bw4 >= GATE_ABS_GBPS
        log(f"gate bw4={bw4:.1f} -> {'FIRE' if healthy else 'wait'}")
        if healthy:
            attempt += 1
            s = fire()
            if s and valid(s):
                captured += 1
                with open(RESULT, "w") as f:
                    json.dump(s, f)
                with open(RESULT + "l", "a") as f:  # .jsonl: every valid pair
                    f.write(json.dumps(s) + "\n")
                log(f"VALID pair captured (raw eff {s['scaling_efficiency']})"
                    " — continuing to poll (report-all protocol)")
            elif s:
                log("pair polluted mid-run (membw probes); continuing")
        time.sleep(POLL_SEC)
    log(f"deadline reached with {captured} valid pair(s) captured")
    return 0 if captured else 1


if __name__ == "__main__":
    raise SystemExit(main())
