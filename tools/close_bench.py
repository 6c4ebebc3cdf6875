#!/usr/bin/env python3
"""Interleaved per-(query,engine) close protocol (the round-12 verdict
task 4), storm-resilient since round 15 (round-14 verdict task 1): for
every round, each query runs Spark-then-DuckDB BACK-TO-BACK, so a
host-load window inflates both engines of a pair together and the
per-pair minima stay comparable.

Storm detection — WHY a probe, not raw loadavg: the close run itself
keeps load1 at 10-25 (the 32-thread Spark side alternating with
DuckDB's own multi-threaded oracles), so a fixed load1 gate can never
be satisfied mid-run. Instead every (query, engine) pair is BRACKETED
by q01 calibration probes: q01 scans the 5-row region table, so its
runtime is a pure Spark-scheduling measurement, and since the close is
sequential nothing of ours runs during the probe — only EXTERNAL
contention can inflate it. An observation is CALM when both its
bracketing probes stay under CLOSE_CALM_FACTOR x the run's best probe.
/proc/loadavg (load1) is still sampled and recorded per observation as
corroborating telemetry.

A reported minimum requires >= 2 calm observations per engine; queries
short of that after the base rounds get targeted extra passes until
satisfied or the pass cap hits; rows that never satisfy the gate ship
in-artifact as `storm` (ratio.py classes them mechanically — reported,
untrusted, out of the real-work aggregate and the weak list).

Emits:
  <out_prefix>_bench.json — Bench-format artifact (spark CALM minima,
                            short keys) + protocol/spread/storm
                            metadata, consumable by ratio.py --build
  <out_prefix>_duck.json  — bench_duck-format DuckDB minima (full
                            names) + spread + host factor + storm list
  <out_prefix>_obs.json   — every observation as [sec, load1_max,
                            probe_before, probe_after] per (query,
                            engine) + the full probe series: calm
                            minima and the storm list recompute from
                            this file alone

Usage:
  close_bench.py <sfDir> <oracle_sql.json> <out_prefix> [rounds=3]

Env knobs: CLOSE_QUERIES=substr,substr (subset), CLOSE_CALM_FACTOR
(default 2.0), CLOSE_MAX_PASSES (default rounds+6).

The Spark side is a long-lived graft.tools.BenchServe JVM driven over
stdin (java -cp target/...:/opt/spark/jars/*); DuckDB runs in-process
between Spark observations. Streaming/rewrite gates run like any
other (classification happens later in ratio.py).
"""
import json
import os
import subprocess
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Host calibration (round-13 verdict task 4): q01 scans the 5-row
# region table at EVERY sf, so its close-run minimum is a pure
# Spark-scheduling probe. host_factor = q01_min / Q01_REF_SEC scales
# the 120 ms duck floor threshold with host weather (the fixed floor
# misclassified 15 sf1 queries during the r13 2x degradation).
# Reference: quiet-host long-run minimum, BENCH_SF1_r09d q01 = 0.083s.
Q01_REF_SEC = 0.085
CALIB_QUERY = "q01_scan_sort"
FLOOR_MS_BASE = 120

CALM_FACTOR = float(os.environ.get("CLOSE_CALM_FACTOR", "2.0"))
MIN_CALM = 2

# declared-quadratic oracles (ratio.py EXCLUDED): their DuckDB side is
# an all-pairs/recursive-CTE replay that takes minutes at sf0.1 and is
# excluded from every aggregate — never time them in a close run
SKIP_DUCK = {"x20_dedup_pipeline", "x25_training_pipeline",
             "x50_incremental_dedup", "x56_stream_neardup",
             "x88_entities", "x88b_entities_skewblock"}


def load1():
    return float(open("/proc/loadavg").read().split()[0])


def start_server(sf_dir):
    cp = os.path.join(REPO, "target", "scala-2.13", "classes") + \
        ":/opt/spark/jars/*"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    # the full Spark JavaModuleOptions set — Kryo (sketch states) needs
    # java.nio/sun.nio open, not just exported
    opens = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in
             ["java.lang", "java.lang.invoke", "java.lang.reflect",
              "java.io", "java.net", "java.nio", "java.util",
              "java.util.concurrent", "java.util.concurrent.atomic",
              "jdk.internal.ref", "sun.nio.ch", "sun.nio.cs",
              "sun.security.action", "sun.util.calendar"]]
    proc = subprocess.Popen(
        ["java", "-Xmx96g", "-XX:+IgnoreUnrecognizedVMOptions",
         "--enable-native-access=ALL-UNNAMED"] + opens +
        ["-cp", cp, "graft.tools.BenchServe"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, env=env, text=True, bufsize=1)
    return proc


def ask(proc, cmd, until):
    proc.stdin.write(cmd + "\n")
    proc.stdin.flush()
    lines = []
    while True:
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError(f"server died during {cmd!r}")
        line = line.strip()
        lines.append(line)
        if line.startswith(until):
            return lines


def spark_time(proc, name):
    for line in ask(proc, name, "TIME "):
        if line.startswith("TIME "):
            _, n, sec = line.split()
            assert n == name
            return float(sec)


def main():
    sf_dir, oracle_path, out_prefix = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    max_passes = int(os.environ.get("CLOSE_MAX_PASSES", str(rounds + 6)))

    oracle = {n: q for n, q in json.load(open(oracle_path)).items()
              if n not in SKIP_DUCK}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    proc = start_server(sf_dir)
    names = [ln.split(" ", 1)[1] for ln in ask(proc, "LIST", "DONE")
             if ln.startswith("QUERY ")]
    subset = os.environ.get("CLOSE_QUERIES")
    if subset:
        wanted = {w.strip() for w in subset.split(",") if w.strip()}
        names = [n for n in names if any(w in n for w in wanted)]
    print(f"[close] {len(names)} spark gates, "
          f"{len(oracle)} oracles, {rounds} rounds at {sf_dir}, "
          f"calm factor {CALM_FACTOR}", file=sys.stderr)

    # observation: [sec, load1_max, probe_before, probe_after];
    # probe_after is patched in by the NEXT bracketing probe
    obs_s = {n: [] for n in names}
    obs_d = {n: [] for n in names if n in oracle}
    probes = []
    pending = []  # observations awaiting their closing probe

    def bracket_probe():
        p = spark_time(proc, CALIB_QUERY)
        probes.append(p)
        for o in pending:
            o[3] = p
        pending.clear()
        return p

    def observe(n):
        ask(proc, "GC", "OK")
        pb = bracket_probe()
        l0 = load1()
        s = spark_time(proc, n)
        l1 = load1()
        if s >= 0:
            o = [s, max(l0, l1), pb, None]
            obs_s[n].append(o)
            pending.append(o)
        if n in oracle:
            l0 = load1()
            t0 = time.time()
            con.execute(oracle[n]).fetchall()
            t = time.time() - t0
            o = [t, max(l0, load1()), pb, None]
            obs_d[n].append(o)
            pending.append(o)

    def probe_ref():
        return min(probes) if probes else Q01_REF_SEC

    def calm(entries):
        ref = probe_ref()
        gate = CALM_FACTOR * ref
        out = []
        for s, ld, pb, pa in entries:
            if pb is not None and pb < gate and \
                    pa is not None and pa < gate:
                out.append(s)
        return out

    def satisfied(n):
        if len(calm(obs_s[n])) < MIN_CALM:
            return False
        return n not in oracle or len(calm(obs_d[n])) >= MIN_CALM

    # warm-up pass (JIT/codegen/page-cache): observations discarded
    for n in names:
        spark_time(proc, n)
        if n in oracle:
            con.execute(oracle[n]).fetchall()
    print("[close] warm-up done", file=sys.stderr)

    for r in range(rounds):
        for n in names:
            observe(n)
        bracket_probe()
        print(f"[close] round {r + 1}/{rounds} done  load1 {load1()}  "
              f"probe ref {probe_ref():.3f}", file=sys.stderr)

    # storm extension: targeted passes over queries still lacking
    # MIN_CALM calm observations on either engine
    passes = rounds
    while passes < max_passes:
        needy = [n for n in names if not satisfied(n)]
        if not needy:
            break
        passes += 1
        print(f"[close] storm pass {passes}/{max_passes}: "
              f"{len(needy)} queries below {MIN_CALM} calm obs "
              f"(load1 {load1()}, probe ref {probe_ref():.3f})",
              file=sys.stderr)
        for n in needy:
            observe(n)
        bracket_probe()
    storm = sorted(n for n in names if not satisfied(n))
    if storm:
        print(f"[close] STORM rows (calm gate never satisfied): {storm}",
              file=sys.stderr)

    ask(proc, "EXIT", "BYE")
    proc.wait(timeout=120)

    def best(entries):
        """Calm minimum when the gate was satisfied; otherwise the
        all-observations minimum (the row is storm-listed)."""
        c = calm(entries)
        vals = c if len(c) >= MIN_CALM else [e[0] for e in entries]
        return round(min(vals), 4) if vals else -1.0

    def spread(entries):
        ok = [e[0] for e in entries if e[0] > 0]
        return round(max(ok) / min(ok), 3) if len(ok) >= 2 else 1.0

    def quant(sorted_vals, q):
        if not sorted_vals:
            return 1.0
        return sorted_vals[min(len(sorted_vals) - 1,
                               int(q * len(sorted_vals)))]

    prefix_ok = len({n.split("_", 1)[0] for n in names}) == len(names)

    def short(n):
        return n.split("_", 1)[0] if prefix_ok else n

    s_min = {n: best(v) if v else -1.0 for n, v in obs_s.items()}
    # q01's own minimum additionally sees every probe (same query,
    # same engine — the probes ARE calm-or-not q01 observations)
    if CALIB_QUERY in s_min and probes:
        cal = min(probe_ref(),
                  s_min[CALIB_QUERY] if s_min[CALIB_QUERY] > 0 else 1e9)
        s_min[CALIB_QUERY] = round(cal, 4)
    spreads = sorted(spread(v) for v in obs_s.values() if len(v) >= 2)
    total = round(sum(v for v in s_min.values() if v > 0), 3)
    protocol = (f"interleaved per-(query,engine) CALM minima: each pair "
                f"bracketed by q01 scheduling probes, calm = both "
                f"probes < {CALM_FACTOR} x best probe, >= {MIN_CALM} "
                f"calm obs else storm-listed; {rounds} base rounds + "
                f"warm-up + targeted storm passes (cap {max_passes}), "
                f"spark/duck adjacent per pair (tools/close_bench.py)")
    bench = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": {short(n): s_min[n] for n in names},
        "protocol": protocol,
        "rounds": rounds,
        "passes": passes,
        "calm_factor": CALM_FACTOR,
        "probe_ref_sec": round(probe_ref(), 4),
        "storm": [short(n) for n in storm],
        "calm_obs": {short(n): len(calm(obs_s[n])) for n in names},
        "spread_p50": quant(spreads, 0.5),
        "spread_p90": quant(spreads, 0.9),
        "sf": sf_dir,
    }
    with open(f"{out_prefix}_bench.json", "w") as f:
        json.dump(bench, f, indent=1)

    # host-calibrated floor: never below 1.0 (a faster-than-reference
    # host still pays at least the quiet-host scheduling floor)
    calib = s_min.get(CALIB_QUERY, round(probe_ref(), 4))
    host_factor = round(max(1.0, calib / Q01_REF_SEC), 3) \
        if calib > 0 else 1.0
    d_min = {n: best(v) for n, v in obs_d.items() if v}
    d_spreads = sorted(spread(v) for v in obs_d.values() if len(v) >= 2)
    duck = {
        "total": round(sum(d_min.values()), 3),
        "queries": d_min,
        "protocol": protocol,
        "calm_factor": CALM_FACTOR,
        "probe_ref_sec": round(probe_ref(), 4),
        "storm": storm,
        "calm_obs": {n: [len(calm(obs_s[n])), len(calm(obs_d[n]))]
                     for n in obs_d},
        "spread_p50": quant(d_spreads, 0.5),
        "spread_p90": quant(d_spreads, 0.9),
        "host_factor": host_factor,
        "host_factor_calibration": f"{CALIB_QUERY} calm min {calib}s / "
                                   f"pinned quiet-host ref {Q01_REF_SEC}s",
        "floor_ms": round(FLOOR_MS_BASE * host_factor, 1),
    }
    with open(f"{out_prefix}_duck.json", "w") as f:
        json.dump(duck, f, indent=1)
    with open(f"{out_prefix}_obs.json", "w") as f:
        json.dump({"calm_factor": CALM_FACTOR, "min_calm": MIN_CALM,
                   "probes": probes, "spark": obs_s, "duck": obs_d},
                  f)
    print(f"[close] spark total {total}s  duck total {duck['total']}s  "
          f"spark spread p90 {bench['spread_p90']}  "
          f"duck spread p90 {duck['spread_p90']}  "
          f"storm rows {len(storm)}", file=sys.stderr)


if __name__ == "__main__":
    main()
