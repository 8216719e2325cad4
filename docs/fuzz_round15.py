"""Round-15 fuzz family: fault injection into the stream equivalence
gates' shared ``equiv_ok`` reducer (VERDICT r14 item 7).

Every streaming equivalence gate reduces to one null-safe boolean
compare: ``equiv_ok(batch, streamed, keys, vals)``. The dual-scale
DuckDB oracle can only ever see the gate's GREEN side (its oracle is the
constant ``SELECT TRUE``), so a reducer bug that silently returns true —
the exact three-valued-logic failure class ``~eqNullSafe`` exists to
prevent — would be invisible to every check in the program: the one
remaining oracle-mirrors-engine blind spot.

This family closes it from the RED side: for each of the five gates it
rebuilds the gate's two frames exactly as the registered query does (the
streamed side rides the production ``_replay_events_stream`` cache, so
it is computed once per gate), first sanity-checks the unfaulted verdict
is TRUE, then injects ONE seeded single-row fault into the batch twin
and asserts the verdict flips to FALSE:

  value  — one value column on one row perturbed (+1 / +1s / text swap)
  null   — one value column on one row NULLed (the eqNullSafe class:
           plain ``!=`` evaluates NULL here and ``when(bad,…)`` would
           silently not count it)
  drop   — one row removed (an unmatched streamed row must surface
           through the full-outer join's NULL-vs-value columns)
  add    — one phantom row with an unseen key appended (unmatched on the
           batch side)

A false green (verdict stays TRUE under any injected fault) is a
counted failure. Runs at sf0.001 — the fault classes are row-local, so
scale adds nothing but wall-clock.

Run: python docs/fuzz_round15.py equiv_faults [trials]
     (default 24; the ledger sweep depth)
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from hadoop_web_browsing_logs_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def _gate_frames(spark, which: str):
    """Rebuild (batch, streamed, keys, vals) exactly as the registered gate
    does — same builders, same exclusions, same production replay tags (so
    the streamed side is computed once per gate and cached)."""
    from hadoop_web_browsing_logs_spark.streaming import windows as SW

    if which == "tumbling":
        batch = SW.tumbling_agg(
            SW._batch_events(spark, SF).filter(F.col("ts").isNotNull())
        )
        streamed = SW._replay_tumbling_stream(spark, SF)
        return batch, streamed, ["window_start", "event_type"], ["n_events", "sum_value"]
    if which == "session":
        batch = SW.session_agg(
            SW._batch_events(spark, SF).filter(F.col("ts").isNotNull())
        )
        streamed = SW._replay_events_stream(spark, SF, SW.session_agg, "session")
        return batch, streamed, ["session_start", "user_id"], ["session_end", "n_events"]
    if which == "scd2":
        from hadoop_web_browsing_logs_spark.operators.events_analytics import (
            q_events_scd2,
        )

        batch = q_events_scd2(spark, SF).filter(F.col("valid_to").isNotNull())
        streamed = SW._replay_events_stream(
            spark, SF,
            lambda s: SW.streaming_scd2(
                s.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
            ),
            "scd2", mode="append",
        )
        return batch, streamed, ["user_id", "valid_from", "state"], ["valid_to"]
    if which == "interval":
        from hadoop_web_browsing_logs_spark.streaming.windows import (
            q_stream_interval_join_batch,
        )

        batch = q_stream_interval_join_batch(spark, SF)
        streamed = SW._replay_events_stream(
            spark, SF,
            lambda s: SW.interval_join_views_purchases(
                s.filter(F.col("event_type") == "view"),
                s.filter(F.col("event_type") == "purchase"),
            ),
            "interval_join", mode="append",
        )
        return (
            batch, streamed,
            ["purchase_id", "view_id"],
            ["p_user", "purchase_ts", "view_ts", "value"],
        )
    if which == "interval_left":
        from hadoop_web_browsing_logs_spark.streaming.windows import (
            q_stream_interval_join_left_batch,
        )

        batch = q_stream_interval_join_left_batch(spark, SF)
        streamed = SW._replay_events_stream(
            spark, SF,
            lambda s: SW.interval_join_purchases_left(
                s.filter((F.col("event_type") == "purchase") & F.col("ts").isNotNull()),
                s.filter((F.col("event_type") == "view") & F.col("ts").isNotNull()),
            ),
            "interval_left", mode="append", watermark_sentinel=True,
        ).filter(~F.col("p_user").eqNullSafe(-999))
        return (
            batch, streamed,
            ["purchase_id", "view_id"],
            ["p_user", "purchase_ts", "view_ts", "value"],
        )
    raise ValueError(which)


GATES = ("tumbling", "session", "scd2", "interval", "interval_left")
FAULTS = ("value", "null", "drop", "add")


def _perturb(v):
    """One-off perturbation of a scalar, type-preserving."""
    import datetime as dt

    if isinstance(v, bool):
        return not v
    if isinstance(v, int):
        return v + 1
    if isinstance(v, float):
        return v + 1.0
    if isinstance(v, dt.datetime):
        return v + dt.timedelta(seconds=1)
    if isinstance(v, str):
        return v + "_X"
    return None  # NULL -> value flip handled by caller


def _inject(spark, batch, keys, vals, fault: str, rng: random.Random):
    """Return the batch twin with ONE seeded single-row fault applied."""
    rows = [r.asDict() for r in batch.collect()]
    assert rows, "fault injection needs a non-empty twin"
    i = rng.randrange(len(rows))
    if fault == "value":
        c = rng.choice(vals)
        old = rows[i][c]
        rows[i][c] = _perturb(old) if old is not None else 0
    elif fault == "null":
        # NULL a value column (if already NULL, perturb instead — still a diff)
        c = rng.choice(vals)
        rows[i][c] = None if rows[i][c] is not None else 0
    elif fault == "drop":
        rows.pop(i)
    elif fault == "add":
        # phantom row: clone one row and push its key out of the key space
        ghost = dict(rows[i])
        for k in keys:
            if isinstance(ghost[k], int):
                ghost[k] = -(abs(ghost[k]) + 987654321)
                break
        else:  # no int key — perturb the first key column instead
            ghost[keys[0]] = _perturb(ghost[keys[0]])
        rows.append(ghost)
    # all-nullable copy of the twin's schema: the "null" fault must be able
    # to NULL a count column the aggregate marked non-nullable — the reducer
    # is supposed to CATCH that row, so the injector can't let the schema
    # verifier reject it first
    from pyspark.sql.types import StructField, StructType

    sch = StructType(
        [StructField(f.name, f.dataType, True) for f in batch.schema.fields]
    )
    return spark.createDataFrame(rows, sch)


def fuzz_equiv_faults(spark, trials: int = 24) -> int:
    from hadoop_web_browsing_logs_spark.streaming.windows import equiv_ok

    fails = 0
    sane = set()
    for t in range(trials):
        rng = random.Random(15000 + t)
        gate = GATES[t % len(GATES)]
        fault = FAULTS[(t // len(GATES)) % len(FAULTS)]
        batch, streamed, keys, vals = _gate_frames(spark, gate)
        if gate not in sane:  # unfaulted verdict must be TRUE (once per gate)
            ok = equiv_ok(batch, streamed, keys, vals).first()["ok"]
            if not ok:
                fails += 1
                print(f"  trial {t} {gate}: UNFAULTED GATE NOT GREEN")
                continue
            sane.add(gate)
        faulted = _inject(spark, batch, keys, vals, fault, rng)
        verdict = equiv_ok(faulted, streamed, keys, vals).first()["ok"]
        if verdict:  # FALSE GREEN — the blind spot this family exists for
            fails += 1
            print(f"  trial {t} {gate}/{fault}: FALSE GREEN (verdict ok under injected fault)")
    print(f"fuzz_equiv_faults: {trials - fails}/{trials} ok")
    return fails


def fuzz_jaccard_prefix_skew(spark, trials: int = 24) -> int:
    """The PPJoin positional filter on randomized BOILERPLATE-heavy corpora
    (the round-15 skew-study shape, randomized): a block of shared tokens
    carried by a random subset of docs, random unique tails, random
    near-dup plants, random tau drawn from a hostile set that includes
    decimal-above-float values (0.7, 0.3 — the _prefix_threshold_fraction
    guard) and low taus whose prefixes reach deep into the shared block.
    Oracle: an INDEPENDENT pure-Python brute force over the same texts
    (set Jaccard, float >= tau — exactly the registered final filter).
    Checks both directions: no missing pair (the filter never prunes a
    qualifying pair) and no extra pair (the verify never leaks)."""
    from hadoop_web_browsing_logs_spark.operators.dedup import jaccard_prefix_pairs

    taus = (0.9, 0.8, 0.75, 0.7, 2 / 3, 0.5, 0.3)
    fails = 0
    for t in range(trials):
        rng = random.Random(15100 + t)
        tau = taus[t % len(taus)]
        n_boiler_tok = rng.randint(3, 12)
        boiler = [f"b{j}" for j in range(n_boiler_tok)]
        rows = []
        texts = {}
        for i in range(rng.randint(20, 50)):
            if rng.random() < 0.5:  # boilerplate doc: shared block + tail
                toks = boiler + [f"u{i}x{j}" for j in range(rng.randint(0, 6))]
            else:  # unique doc
                toks = [f"v{i}x{j}" for j in range(rng.randint(1, 12))]
            rng.shuffle(toks)
            texts[i] = toks
            rows.append((i, " ".join(toks)))
        # planted near-dups: clone a doc and perturb 0-2 tokens
        next_id = len(rows)
        for _ in range(rng.randint(1, 5)):
            src_id = rng.randrange(len(texts))
            toks = list(texts[src_id])
            for _ in range(rng.randint(0, 2)):
                if toks and rng.random() < 0.7:
                    toks[rng.randrange(len(toks))] = f"p{next_id}"
                else:
                    toks.append(f"q{next_id}")
            texts[next_id] = toks
            rows.append((next_id, " ".join(toks)))
            next_id += 1

        want = set()
        sets = {i: set(tk) for i, tk in texts.items() if tk}
        for a in sets:
            for b in sets:
                if a < b:
                    inter = len(sets[a] & sets[b])
                    if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= tau:
                        want.add((a, b))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {(r.doc_a, r.doc_b) for r in jaccard_prefix_pairs(docs, tau).collect()}
        if got != want:
            fails += 1
            print(
                f"  trial {t} tau={tau}: missing={sorted(want - got)[:4]} "
                f"extra={sorted(got - want)[:4]}"
            )
    print(f"fuzz_jaccard_prefix_skew: {trials - fails}/{trials} ok")
    return fails


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    override = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark("fuzz15")
    total = 0
    for name, fn, trials in (
        ("equiv_faults", fuzz_equiv_faults, 24),
        ("jaccard_prefix_skew", fuzz_jaccard_prefix_skew, 24),
    ):
        if which in (name, "all"):
            total += fn(spark, override or trials)
    print(f"TOTAL FAILURES: {total}")
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
