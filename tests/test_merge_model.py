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
