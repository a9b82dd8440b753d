"""P9 entry-lifting analog: deterministic keys, dedup, byte round-trip."""

from pyspark.sql import functions as F

from unarxive_spark.operators.lift import lift_tool_entries, reinline


def test_lift_roundtrip_byte_identity(spark, transcripts_small):
    turns, entries = lift_tool_entries(transcripts_small)
    # every lifted tool cell is a marker; entry ids are sha1 hex
    lifted_rows = turns.filter(F.col("entry_id").isNotNull())
    bad = lifted_rows.filter(
        ~F.col("tool").rlike(r"^\{\{tool:[0-9a-f]{40}\}\}$")
    ).count()
    assert bad == 0
    # round-trip: re-inlining reproduces the original table byte-for-byte
    restored = reinline(turns, entries).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    orig = transcripts_small.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    assert restored.exceptAll(orig).count() == 0
    assert orig.exceptAll(restored).count() == 0


def test_lift_dedup_and_determinism(spark):
    rows = [
        ("a", 0, "tool", "x", "lookup(conv:c000001)"),
        ("a", 1, "tool", "y", "lookup(conv:c000001)"),  # same payload
        ("a", 2, "tool", "z", "lookup(conv:c000002)"),
        ("b", 0, "tool", "w", "lookup(conv:c000001)"),  # other conv
        ("b", 1, "user", "u", ""),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2025-01-01")))
    turns, entries = lift_tool_entries(t)
    e = entries.collect()
    # same payload in same conv → ONE entry (earliest turn); different
    # conv → different key (scope in the hash)
    assert len(e) == 3
    a_first = [r for r in e if r["conv_id"] == "a" and r["payload"].endswith("01)")]
    assert a_first[0]["first_turn_idx"] == 0
    ids_a = {r["entry_id"] for r in e if r["conv_id"] == "a"}
    ids_b = {r["entry_id"] for r in e if r["conv_id"] == "b"}
    assert not (ids_a & ids_b)
    # empty tool untouched
    untouched = turns.filter("conv_id = 'b' AND turn_idx = 1").collect()[0]
    assert untouched["tool"] == "" and untouched["entry_id"] is None
    # deterministic across recomputation
    _, e2 = lift_tool_entries(t)
    assert {r["entry_id"] for r in e2.collect()} == {r["entry_id"] for r in e}
