"""Model-based randomized test of the CDC apply path.

Generates seeded random op sequences (create / update / delete /
whole-batch redelivery, with growing, shrinking, and empty turn
arrays) over a small key space, replays them through ``CdcApplier``
in random micro-batch splits, and compares the final parent and
child tables against a pure-Python reference model that applies the
same semantics row-at-a-time: last-writer-wins per key by ``seq``,
whole-image replacement of the child array on upsert (the delete-
then-insert contract of flatten.upsert mode,
JdbcSinkConfig.java:163-178), tombstone wipes the key everywhere.

This is the direct stress test for the derived shrunk-to-empty
delete-scope predicate (operators/merge.py): random shrink-to-empty
transitions must leave zero stale child rows.
"""

import datetime
import random

import pytest

from kafka_connect_jdbc_flatten_spark.operators.merge import CdcApplier
from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan
from kafka_connect_jdbc_flatten_spark.sources.changelog import (
    CHANGELOG_SCHEMA,
    TRANSCRIPT_KEY_SCHEMA,
    TRANSCRIPT_VALUE_SCHEMA,
    transcript_flatten_config,
)

ROLES = ("user", "assistant", "system")
TS = datetime.datetime(2024, 1, 1)


def env(conv, turns, op, seq):
    val = None if op == "d" else (conv, [(i, r, t, tool, TS) for (i, r, t, tool) in turns])
    return ("transcripts", 0, seq, TS, "CreateTime", (conv,), None, val, op, seq, TS)


def mkdf(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


@pytest.fixture()
def plan():
    cfg = transcript_flatten_config()
    return compile_flatten_plan(
        TRANSCRIPT_KEY_SCHEMA,
        TRANSCRIPT_VALUE_SCHEMA,
        cfg,
        value_record_name="Conversation",
        key_record_name="ConversationKey",
    )


def _random_turns(rng, max_turns=4):
    n = rng.randint(0, max_turns)  # 0 => empty array (shrunk-to-empty)
    return [
        (i, rng.choice(ROLES), f"t{rng.randint(0, 99)}", rng.choice(("", "tool")))
        for i in range(n)
    ]


def _random_ops(rng, n_ops, n_keys):
    """(conv, op, turns, seq) tuples; seq strictly increasing."""
    ops = []
    for seq in range(1, n_ops + 1):
        conv = f"c{rng.randint(1, n_keys)}"
        op = rng.choices(("c", "u", "d"), weights=(4, 4, 2))[0]
        turns = None if op == "d" else _random_turns(rng)
        ops.append((conv, op, turns, seq))
    return ops


def _model_final_state(ops):
    """Reference model: last op per key wins (ops arrive in seq order)."""
    last = {}
    for conv, op, turns, seq in ops:
        if op == "d":
            last.pop(conv, None)
        else:
            last[conv] = turns
    parents = {conv for conv in last}
    children = {
        (conv, i, role, text, tool)
        for conv, turns in last.items()
        for (i, role, text, tool) in turns
    }
    return parents, children


def _split_batches(rng, ops):
    batches, cur = [], []
    for o in ops:
        cur.append(o)
        if cur and rng.random() < 0.25:
            batches.append(cur)
            cur = []
    if cur:
        batches.append(cur)
    return batches


@pytest.mark.parametrize("seed", [7, 23, 1031])
def test_random_op_sequences_match_reference_model(spark, plan, tmp_path, seed):
    rng = random.Random(seed)
    ops = _random_ops(rng, n_ops=40, n_keys=6)
    batches = _split_batches(rng, ops)

    ap = CdcApplier(spark, str(tmp_path / f"wh{seed}"), plan, n_buckets=4)
    bid = 0
    for batch in batches:
        df = mkdf(spark, [env(c, t, op, s) for (c, op, t, s) in batch])
        ap.apply_batch(df, batch_id=bid)
        if rng.random() < 0.3:  # crash-redelivery of the same batch id
            ap.apply_batch(df, batch_id=bid)
        bid += 1
    if rng.random() < 0.5:
        ap.maintain()  # compaction must not change visible state

    want_parents, want_children = _model_final_state(ops)
    got_parents = {r.conv_id for r in ap.read("transcripts_conversation").collect()}
    got_children = {
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in ap.read("transcripts_conversation_turns").collect()
    }
    assert got_parents == want_parents
    assert got_children == want_children
    # one row per live key in the parent table (no duplicate images)
    assert ap.read("transcripts_conversation").count() == len(want_parents)


def test_random_update_mode_matches_sql_update_model(spark, tmp_path):
    """insert.mode=update under random op sequences vs a sequential
    SQL-UPDATE model: an update rewrites EVERY base row matching the
    row key (multiplicity preserved — the r3 advisory), unknown keys
    are silently ignored, tombstones wipe the key scope.  Base state
    is seeded through insert mode so duplicate rows with divergent
    values exist before the first update."""
    import dataclasses
    from collections import Counter

    from kafka_connect_jdbc_flatten_spark.sources.changelog import (
        transcript_flatten_config,
    )

    rng = random.Random(2024)

    def _plan(mode):
        cfg = dataclasses.replace(
            transcript_flatten_config(), insert_mode=mode, delete_enabled=True
        )
        return compile_flatten_plan(
            TRANSCRIPT_KEY_SCHEMA, TRANSCRIPT_VALUE_SCHEMA, cfg,
            value_record_name="Conversation", key_record_name="ConversationKey",
        )

    wh = str(tmp_path / "wh")
    # ---- seed: insert-mode appends, 1-2 envelopes per conv so some
    # (conv, turn_idx) row keys carry multiplicity > 1 with different
    # values (the duplicates an update must rewrite ALL of)
    seeder = CdcApplier(spark, wh, _plan("insert"), n_buckets=4)
    child: dict[tuple, list] = {}  # (conv, idx) -> list of (role, text, tool)
    parent: Counter = Counter()
    seed_rows, seq = [], 0
    for k in range(1, 5):  # c1..c4 seeded; c5 in ops is never seeded
        conv = f"c{k}"
        for _ in range(rng.randint(1, 2)):
            seq += 1
            turns = _random_turns(rng, max_turns=3)
            seed_rows.append(env(conv, turns, "c", seq))
            parent[conv] += 1
            for (i, role, text, tool) in turns:
                child.setdefault((conv, i), []).append((role, text, tool))
    seeder.apply_batch(mkdf(spark, seed_rows), batch_id=0)

    # ---- random update/delete stream through an update-mode applier.
    # Linear seq-order application is the correct model even though the
    # applier runs all of a batch's updates before its deletes: updates
    # never resurrect a deleted key, so update-then-delete and
    # delete-then-update converge to the same final state.
    ops = []
    for s in range(seq + 1, seq + 31):
        conv = f"c{rng.randint(1, 5)}"
        op = rng.choices(("u", "d"), weights=(4, 1))[0]
        ops.append((conv, op, None if op == "d" else _random_turns(rng), s))
    ap = CdcApplier(spark, wh, _plan("update"), n_buckets=4)
    for bid, batch in enumerate(_split_batches(rng, ops), start=1):
        df = mkdf(spark, [env(c, t, op, s) for (c, op, t, s) in batch])
        ap.apply_batch(df, batch_id=bid)
        if rng.random() < 0.3:  # crash-redelivery must be idempotent
            ap.apply_batch(df, batch_id=bid)
    if rng.random() < 0.5:
        ap.maintain()  # compaction must not change visible state

    for conv, op, turns, _ in ops:
        if op == "d":
            parent.pop(conv, None)
            child = {k: v for k, v in child.items() if k[0] != conv}
        else:
            for (i, role, text, tool) in turns:
                if (conv, i) in child:  # unknown row keys silently ignored
                    child[(conv, i)] = [(role, text, tool)] * len(child[(conv, i)])
    want_children = Counter(
        (c, i, role, text, tool)
        for (c, i), vals in child.items()
        for (role, text, tool) in vals
    )
    got_children = Counter(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in ap.read("transcripts_conversation_turns").collect()
    )
    assert got_children == want_children
    got_parents = Counter(
        r.conv_id for r in ap.read("transcripts_conversation").collect()
    )
    assert got_parents == parent


def test_random_insert_mode_matches_append_model(spark, tmp_path):
    """insert.mode=insert under random op sequences: every non-
    tombstone envelope's flattened rows append (duplicates accumulate,
    tombstones ignored) — vs a Python append model."""
    import dataclasses

    from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan
    from kafka_connect_jdbc_flatten_spark.sources.changelog import (
        transcript_flatten_config,
    )

    rng = random.Random(404)
    cfg = dataclasses.replace(
        transcript_flatten_config(), insert_mode="insert", delete_enabled=True
    )
    iplan = compile_flatten_plan(
        TRANSCRIPT_KEY_SCHEMA, TRANSCRIPT_VALUE_SCHEMA, cfg,
        value_record_name="Conversation", key_record_name="ConversationKey",
    )
    ops = _random_ops(rng, n_ops=25, n_keys=4)
    batches = _split_batches(rng, ops)
    ap = CdcApplier(spark, str(tmp_path / "wh"), iplan, n_buckets=4)
    for bid, batch in enumerate(batches):
        ap.apply_batch(mkdf(spark, [env(c, t, op, s) for (c, op, t, s) in batch]), batch_id=bid)
    # model: multiset of (conv, turn_idx, role, text, tool) across all
    # non-delete envelopes, duplicates preserved
    from collections import Counter

    want = Counter(
        (conv, i, role, text, tool)
        for conv, op, turns, _ in ops
        if op != "d"
        for (i, role, text, tool) in turns
    )
    got = Counter(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in ap.read("transcripts_conversation_turns").collect()
    )
    assert got == want
    want_parents = Counter(conv for conv, op, _, _ in ops if op != "d")
    got_parents = Counter(
        r.conv_id for r in ap.read("transcripts_conversation").collect()
    )
    assert got_parents == want_parents
