"""Per-query Spark-vs-DuckDB ratio table (the auditable 2x-bar view),
measured under a variance-controlled protocol.

Round-8 protocol (replaces the round-2..7 "Spark times from a previous
BENCH_FULL.json session, DuckDB timed later" convention, whose two
sides could sit minutes apart and absorb different ambient machine
state — the r7 verdict's 1.78x->2.07x drift on identical code):

* **Idle-box gate**: refuses to start unless 1-min loadavg is under
  ``SPARK_GRAFT_LOAD_MAX`` (default 4.0 on this 32-cpu box) — the
  contaminated-run failure mode (a concurrent process skewing DuckDB up
  to ~4x, caught and discarded in round 7) is now rejected by the tool
  instead of by post-hoc vigilance.  Start/end loadavg are recorded.
* **Interleaved paired runs**: for every comparable query the engines
  alternate S,D,S,D,S,D on the same warm processes (one unmeasured
  warmup pass each first), so any ambient drift hits both sides of
  every pair equally instead of biasing one engine's whole column.
* **Median-of-3 with the spread recorded**: the headline ratio is
  sum(per-query median spark) / sum(per-query median duck); the three
  time-aligned pass ratios (pass_i spark total / pass_i duck total)
  are recorded as the honest run-to-run spread, per-query medians and
  min/max go to BENCH_RATIO.json.

Excluded rows (property / streaming-replay / rows-only — see the table
labels) take their display-only Spark wall from BENCH_FULL.json as
before; they never enter the comparable subset.

Run:

    PYTHONPATH=/root/repo python tools/bench_ratio.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shuttle_spark.contracts import REGISTRY
from shuttle_spark.testing import duckdb_views

BEGIN = "<!-- bench-ratio:begin -->"
END = "<!-- bench-ratio:end -->"
PASSES = 3


def _loadavg1() -> float:
    return os.getloadavg()[0]


def _comparable(c) -> bool:
    if c.oracle is None:
        return False
    # property-TAGGED contracts run deliberately pessimized plan shapes
    # (broadcast disabled so AQE-skew / bloom machinery has an exchange
    # to act on) and assert the executed plan alongside the values —
    # their oracle is a constant, so a wall-clock ratio compares a
    # stress harness against nothing.  Streaming replays run a real
    # Structured Streaming query (state stores, fresh checkpoint) vs
    # the oracle's batch SQL; their batch twins ARE comparable.
    if c.oracle.lstrip().upper().startswith("SELECT TRUE"):
        return False
    if "property" in (c.tags or ()):
        return False
    if c.name.startswith("stream_"):
        return False
    return True


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    load_max = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "4.0"))
    load_start = _loadavg1()
    if load_start > load_max:
        print(
            f"REFUSED: 1-min loadavg {load_start:.2f} > {load_max:.2f} —"
            " the box is not idle; a concurrent process would contaminate"
            " the paired measurement (round-7 lesson). Re-run when idle"
            " or raise SPARK_GRAFT_LOAD_MAX deliberately.",
            file=sys.stderr,
        )
        sys.exit(3)

    # display-only Spark walls for the excluded rows
    try:
        with open(os.path.join(root, "BENCH_FULL.json")) as f:
            bench_full = json.load(f).get("queries", {})
    except FileNotFoundError:
        bench_full = {}

    from shuttle_spark import get_session

    # Round 9 (VERDICT r8 item 1): no bench-local conf — the size-aware
    # profile lives in session.profile_for_corpus, so this harness
    # measures exactly what get_session(data_dir=...) ships.
    spark = get_session("bench-ratio", data_dir=sf_dir)
    con = duckdb_views(sf_dir)

    comp = [c for c in REGISTRY.values() if _comparable(c)]
    excluded = [c for c in REGISTRY.values() if not _comparable(c)]

    # Warm both processes once (JVM codegen caches, parquet footers,
    # DuckDB page cache) before any measured pass.
    REGISTRY["agg_tpch_q1"].build(spark, sf_dir).collect()
    con.execute(REGISTRY["agg_tpch_q1"].oracle).fetchall()

    # Measured per-query floor on THIS warm session (median of 7): the
    # wall cost of plan+schedule+collect of one row, paid per query
    # regardless of data volume; amortizes away at real scale.  Round 10:
    # the floor is measured at START and END and the artifact records
    # both plus a host-speed probe — this guest runs on a shared
    # hypervisor host whose neighbors are invisible to loadavg, and the
    # observed floor moved 0.10-0.28 s between guest-idle runs; a
    # single stale sample silently distorts the marginal.
    def _floor_sample() -> float:
        samples = []
        for _ in range(7):
            t0 = time.perf_counter()
            spark.range(1).collect()
            samples.append(time.perf_counter() - t0)
        return statistics.median(samples)

    def _host_probe() -> float:
        """Fixed CPU loop: pure host-speed indicator (seconds)."""
        t0 = time.perf_counter()
        acc = 0
        for i in range(3_000_000):
            acc += i * i
        return time.perf_counter() - t0

    probe_start = _host_probe()
    floor_start = _floor_sample()
    floor = floor_start

    per_q: dict[str, dict] = {}
    pass_spark = [0.0] * PASSES
    pass_duck = [0.0] * PASSES
    for c in comp:
        # unmeasured warmup pass, engine order fixed S-then-D
        c.build(spark, sf_dir).collect()
        con.execute(c.oracle).fetchall()
        s_samples, d_samples = [], []
        for i in range(PASSES):
            t0 = time.perf_counter()
            c.build(spark, sf_dir).collect()
            s = time.perf_counter() - t0
            t0 = time.perf_counter()
            con.execute(c.oracle).fetchall()
            d = time.perf_counter() - t0
            s_samples.append(s)
            d_samples.append(d)
            pass_spark[i] += s
            pass_duck[i] += d
        per_q[c.name] = {
            "spark_med": statistics.median(s_samples),
            "duck_med": statistics.median(d_samples),
            "spark_min": min(s_samples),
            "spark_max": max(s_samples),
            "duck_min": min(d_samples),
            "duck_max": max(d_samples),
            "compat": "compat" in (c.tags or ()),
            # ADVICE r10: rows tagged "memoized" intentionally exclude
            # once-per-session catalog work (e.g. schema_evolution_read's
            # mergeSchema footer merge) from their warm passes — the
            # DuckDB side's view catalog is likewise once-per-connection,
            # but the flag makes the asymmetry self-documenting so the
            # row is read as an aggregate-only timing, not a read timing
            "memoized": "memoized" in (c.tags or ()),
        }

    load_end = _loadavg1()
    floor_end = _floor_sample()
    probe_end = _host_probe()
    # the floor applied to the marginal is the median of both readings —
    # robust to the host drifting mid-run in either direction
    floor = statistics.median([floor_start, floor_end])
    comp_spark = sum(q["spark_med"] for q in per_q.values())
    comp_duck = sum(q["duck_med"] for q in per_q.values())
    n_comp = len(per_q)
    pass_ratios = [
        pass_spark[i] / pass_duck[i] if pass_duck[i] else float("inf")
        for i in range(PASSES)
    ]
    headline = comp_spark / comp_duck if comp_duck else float("inf")
    comp_marginal = max(comp_spark - floor * n_comp, 0.0)
    marginal_ratio = comp_marginal / comp_duck if comp_duck else float("inf")
    # Floor-normalized headline (VERDICT r10 item 3): the same run with
    # its measured per-query floor REPLACED by the reference floor a
    # quiet host shows (0.065 s — run D's healthy end-of-run sample;
    # hypervisor neighbors moved the observed floor 0.06-0.28 s across
    # otherwise-identical runs).  raw >> normalized identifies a
    # hot-neighbor run from the artifact alone; on a quiet host the two
    # numbers coincide.  The floor is per-QUERY scheduling cost, so this
    # is the one term contention inflates asymmetrically (DuckDB's floor
    # is sub-ms).
    FLOOR_REF = 0.065
    headline_floor_norm = (
        (comp_marginal + FLOOR_REF * n_comp) / comp_duck
        if comp_duck
        else float("inf")
    )

    artifact = {
        "protocol": "interleaved-paired, median-of-3, idle-gated",
        "sf_dir": sf_dir,
        "n_comparable": n_comp,
        "headline_end_to_end": round(headline, 4),
        "headline_floor_normalized": round(headline_floor_norm, 4),
        "floor_reference_sec": FLOOR_REF,
        "marginal": round(marginal_ratio, 4),
        "pass_ratios": [round(r, 4) for r in pass_ratios],
        "pass_spark_sec": [round(s, 2) for s in pass_spark],
        "pass_duck_sec": [round(d, 2) for d in pass_duck],
        "comp_spark_sec": round(comp_spark, 2),
        "comp_duck_sec": round(comp_duck, 2),
        "floor_sec": round(floor, 4),
        "floor_start_sec": round(floor_start, 4),
        "floor_end_sec": round(floor_end, 4),
        "host_probe_start_sec": round(probe_start, 4),
        "host_probe_end_sec": round(probe_end, 4),
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(load_end, 2),
        "load_max": load_max,
        "queries": {
            k: {kk: (round(vv, 4) if isinstance(vv, float) else vv)
                for kk, vv in v.items()}
            for k, v in per_q.items()
        },
    }
    with open(os.path.join(root, "BENCH_RATIO.json"), "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    render(root, artifact)


def render(root: str, artifact: dict) -> None:
    """Regenerate BASELINE.md's bench-ratio section from an artifact dict
    — also reachable as ``bench_ratio.py --render [BENCH_RATIO.json]`` so
    the committed artifact and the markdown can never disagree (e.g.
    when the committed run is not the last run executed)."""
    try:
        with open(os.path.join(root, "BENCH_FULL.json")) as f:
            bench_full = json.load(f).get("queries", {})
    except FileNotFoundError:
        bench_full = {}
    excluded = [c for c in REGISTRY.values() if not _comparable(c)]
    sf_dir = artifact["sf_dir"]
    load_start = artifact["loadavg_start"]
    load_end = artifact["loadavg_end"]
    load_max = artifact["load_max"]
    floor = artifact["floor_sec"]
    n_comp = artifact["n_comparable"]
    comp_spark = artifact["comp_spark_sec"]
    comp_duck = artifact["comp_duck_sec"]
    comp_marginal = max(comp_spark - floor * n_comp, 0.0)
    marginal_ratio = artifact["marginal"]
    headline = artifact["headline_end_to_end"]
    headline_floor_norm = artifact["headline_floor_normalized"]
    pass_ratios = artifact["pass_ratios"]
    per_q = artifact["queries"]

    spread = (
        f"{min(pass_ratios):.2f}x–{max(pass_ratios):.2f}x"
        if pass_ratios else "n/a"
    )
    lines = [
        BEGIN,
        "## Per-query head-to-head (generated by tools/bench_ratio.py)",
        "",
        f"sf_dir `{sf_dir}`; **variance-controlled protocol**: idle-box"
        f" gate (1-min loadavg {load_start:.2f} at start, limit"
        f" {load_max:.1f}; {load_end:.2f} at end — end load is this run's"
        " own work), then per query one unmeasured warmup pass per engine"
        " followed by THREE interleaved S,D pairs on the same warm"
        " processes; per-query medians-of-3 are summed for the headline,"
        " and the three time-aligned pass ratios are the recorded"
        " run-to-run spread.  Full per-query medians and min/max are in"
        " BENCH_RATIO.json.",
        "",
        f"**Comparable subset ({n_comp} batch queries with real SQL"
        f" oracles): Spark {comp_spark:.1f} s vs DuckDB {comp_duck:.1f} s"
        f" = {headline:.2f}x end-to-end (median-of-3; paired pass spread"
        f" {spread}); subtracting the MEASURED per-query scheduling floor"
        f" ({floor:.2f} s/query on this warm session) the marginal"
        f" data-path cost is {comp_marginal:.1f} s ="
        f" {marginal_ratio:.2f}x — the number that scales, since the"
        " floor is per-query, not per-byte.  At the reference quiet-host"
        f" floor ({0.065:.3f} s/query) the same run reads"
        f" {headline_floor_norm:.2f}x — raw far above normalized flags a"
        " hot-neighbor run from the artifact alone.**  Excluded and listed"
        " below: property contracts (constant `SELECT TRUE` oracles — the"
        " Spark side measures recall/tolerance across several jobs, the"
        " oracle does nothing), rows-only contracts, and streaming"
        " replays (the Spark side runs a real Structured Streaming query"
        " with state stores and a fresh checkpoint; their batch twins ARE"
        " in the subset).",
        "",
        "Why this protocol: rounds 2-7 timed the two engines in separate"
        " sessions minutes apart, so ambient machine state (page cache,"
        " a neighbor process, floor drift of 0.06-0.10 s/query) moved the"
        " committed headline 1.75x-2.13x on identical code — round 7"
        " shipped OVER the 2x bar purely on protocol noise, with one"
        " contaminated run caught only by hand.  Interleaving makes both"
        " engines see the same seconds of machine state; the idle gate"
        " makes contamination a refused run instead of a judgment call;"
        " the pass spread quantifies what noise remains.",
        "",
        "| query | spark s (med) | duckdb s (med) | ratio |",
        "|---|---|---|---|",
    ]
    rows_sorted = sorted(per_q.items(), key=lambda kv: -kv[1]["spark_med"])
    for name, q in rows_sorted:
        label = " (compat)" if q["compat"] else ""
        if q.get("memoized"):
            label += " (session-memoized read)"
        r = q["spark_med"] / q["duck_med"] if q["duck_med"] else float("inf")
        lines.append(
            f"| {name}{label} | {q['spark_med']:.2f} | {q['duck_med']:.3f} |"
            f" {r:.1f}x |"
        )
    for c in sorted(excluded, key=lambda c: c.name):
        st = bench_full.get(c.name)
        st_s = f"{st:.2f}" if st is not None else "—"
        kind = (
            "rows-only" if c.oracle is None
            else "streaming replay" if c.name.startswith("stream_")
            else "property"
        )
        lines.append(f"| {c.name} | {st_s} | ({kind}) | — |")
    lines.append(END)

    path = os.path.join(root, "BASELINE.md")
    text = open(path).read()
    if BEGIN in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END)[1]
        text = pre + "\n".join(lines) + post
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines) + "\n"
    open(path, "w").write(text)
    print(
        f"updated {path} + BENCH_RATIO.json: {headline:.2f}x end-to-end"
        f" (passes {', '.join(f'{r:.2f}x' for r in pass_ratios)}),"
        f" {marginal_ratio:.2f}x marginal, {n_comp} queries,"
        f" load {load_start:.2f}->{load_end:.2f}"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--render":
        _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
            _root, "BENCH_RATIO.json"
        )
        with open(src) as f:
            render(_root, json.load(f))
    else:
        main()
