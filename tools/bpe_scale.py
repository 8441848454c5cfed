"""BPE family on the scale curve (VERDICT r10 item 1c).

Both BPE contracts are replay-equality gated (no SQL twin: the merge
loop rewrites the relation it aggregates, and the encode census shares
its kernel with the trainer), so they can't ride tools/bench_scale.py's
ratio rows — these are ABSOLUTE engine walls like kcore_peel's.

What the study prices:

* ``bpe_train`` (distributed rounds) — the 2-jobs-per-merge sequential
  bound the docstring states.  Expected shape: wall ~ corpus-collapse
  cost + n_merges x per-round constant; the per-round constant grows
  with the DISTINCT-WORD relation (sub-linear in corpus size because
  vocabulary growth is sub-linear — Heaps' law), so the curve should
  flatten as SF grows.
* ``bpe_train`` (driver fast path) — the same table via
  ``_bpe_train_vocab`` (collect + incremental pair counts).  The gap
  between the two walls IS the documented job-launch latency trade; the
  study also re-asserts table equality at every point (a scale-sized
  parity gate on top of the pytest one).
* ``bpe_subtoken_stats`` — one corpus scan + word-collapse + vocab-sized
  Arrow encode + one two-phase aggregate; should scale like the scan.

Run AFTER make_scale_data.py has materialized .scaledata/sf*:

    PYTHONPATH=/root/repo python tools/bpe_scale.py [sf-labels...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf0.3", os.path.join(REPO, ".scaledata", "sf0.3")),
    ("sf1", os.path.join(REPO, ".scaledata", "sf1")),
    ("sf3", os.path.join(REPO, ".scaledata", "sf3")),
    ("sf10", os.path.join(REPO, ".scaledata", "sf10")),
]

N_MERGES = 15
ENCODE_MERGES = [
    ("e", "r"), ("er", "s"), ("i", "n"), ("in", "g"),
    ("o", "w"), ("t", "h"), ("th", "e"), ("a", "n"),
]


def main() -> None:
    only = set(sys.argv[1:])
    from shuttle_spark import get_session
    from shuttle_spark.catalog import load_table
    from shuttle_spark.operators.pipeline import (
        bpe_subtoken_stats,
        bpe_train,
    )

    spark = get_session("bpe-scale")
    path = os.path.join(REPO, "BENCH_SCALE.json")
    out: dict = {"points": {}, "queries": {}}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    # an existing artifact may predate either top-level key (ADVICE r11)
    out.setdefault("points", {})
    out.setdefault("queries", {})
    train_row = out["queries"].setdefault("bpe_train", {})
    train_row["label"] = "no-oracle"
    train_row["note"] = (
        "replay-equality gated (bpe_merges_equal); absolute walls for the"
        f" distributed rounds vs the driver fast path at n_merges={N_MERGES}"
        " — the gap is the documented 2-jobs-per-merge launch-latency"
        " bound; table equality re-asserted at every point"
    )
    enc_row = out["queries"].setdefault("bpe_subtoken_stats", {})
    enc_row["label"] = "no-oracle"
    enc_row["note"] = (
        "replay-equality gated (bpe_encode_stats_equal); absolute walls —"
        " one corpus scan + word collapse + vocab-sized Arrow encode +"
        " one two-phase aggregate (no collect_list since r11)"
    )
    warmed = False
    for label, sf_dir in POINTS:
        if only and label not in only:
            continue
        if not os.path.isdir(sf_dir):
            print(f"SKIP {label}: {sf_dir} missing", file=sys.stderr)
            continue
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()  # warm the scan before timing
        if not warmed:
            # absorb one-time JVM codegen + Arrow/pandas-udf warmup so
            # the first point's wall is comparable to the rest
            bpe_train(docs.limit(50), n_merges=2).collect()
            warmed = True

        t0 = time.time()
        dist = [
            tuple(r)
            for r in bpe_train(docs, n_merges=N_MERGES)
            .orderBy("rank")
            .collect()
        ]
        dist_sec = time.time() - t0

        t0 = time.time()
        fast = [
            tuple(r)
            for r in bpe_train(
                docs, n_merges=N_MERGES, driver_fast_max_words=10**8
            )
            .orderBy("rank")
            .collect()
        ]
        fast_sec = time.time() - t0
        assert dist == fast, f"fast-path parity broke at {label}"

        t0 = time.time()
        stats = bpe_subtoken_stats(docs, ENCODE_MERGES).collect()[0]
        enc_sec = time.time() - t0

        train_row[label] = {
            "distributed_sec": round(dist_sec, 4),
            "driver_fast_sec": round(fast_sec, 4),
            "per_merge_sec": round(dist_sec / max(len(dist), 1), 4),
            "n_merges": len(dist),
            "tables_equal": True,
            "n_docs": n_docs,
        }
        enc_row[label] = {
            "spark_sec": round(enc_sec, 4),
            "n_docs": n_docs,
            "n_words": int(stats["n_words"]),
            "n_distinct_words": int(stats["n_distinct_words"]),
            "n_subtokens": int(stats["n_subtokens"]),
            "vocab_subtokens": int(stats["vocab_subtokens"]),
        }
        print(
            f"{label}: train dist={dist_sec:.1f}s fast={fast_sec:.1f}s"
            f" encode={enc_sec:.1f}s distinct_words="
            f"{stats['n_distinct_words']}"
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
