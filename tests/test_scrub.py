"""Scrubber parity: Spark regexp_replace chain == Python oracle, byte-for-byte."""

from __future__ import annotations

from quality_filter.scrub import scrub_turns
from tests import oracle

PII_TEXTS = [
    "Contact us at john.doe@example.com or call +1 (555) 123-4567 today.",
    "My backup is jane_roe+spam@mail.example.org, IP 10.0.0.254, id 123456789012.",
    "See https://example.com/a?x=1 and www.example.net/path for details.",
    "Server 192.168.10.44 retried, ticket 9934817265 opened.",
    "you are an idiot and a worthless loser",
    "no pii here at all",
    "",
    "edge: a@b.co x 1.2.3.4 +12 3456 789",
]


def test_scrub_matches_oracle(spark):
    df = spark.createDataFrame(
        [("c", i, t) for i, t in enumerate(PII_TEXTS)],
        "conv_id string, turn_idx int, text string",
    )
    rows = scrub_turns(df).orderBy("turn_idx").collect()
    for r in rows:
        want = oracle.scrub_of(PII_TEXTS[r["turn_idx"]])
        assert r["scrubbed_text"] == want, (
            PII_TEXTS[r["turn_idx"]],
            r["scrubbed_text"],
            want,
        )
        assert r["scrub_applied"] == (want != PII_TEXTS[r["turn_idx"]])


def test_scrub_on_synth_matches_oracle(spark, transcripts, transcript_rows):
    got = {
        (r["conv_id"], r["turn_idx"]): r["scrubbed_text"]
        for r in scrub_turns(transcripts).select(
            "conv_id", "turn_idx", "scrubbed_text"
        ).collect()
    }
    for r in transcript_rows:
        want = oracle.scrub_of(r["text"] or "")
        assert got[(r["conv_id"], r["turn_idx"])] == want
