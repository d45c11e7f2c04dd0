"""SRT/WebVTT cue extraction (operators/subtitles.py): parse
semantics, malformed-block tolerance, window alignment, and the
no-Python plan contract."""

from __future__ import annotations

import pytest

from sif_spark.operators.subtitles import (
    align_cues_to_windows,
    srt_cues,
    vtt_cues,
)

SRT = (
    "1\r\n00:00:01,000 --> 00:00:04,200\r\nHello there\r\ngeneral Kenobi\r\n"
    "\r\n"
    "2\n00:00:05,500 --> 00:00:06,000\nShort cue\n"
    "\n"
    "no arrow anywhere in this block\nat all\n"
    "\n"
    "solo\n"
    "\n"
    "3\n01:02:03,450 --> 01:02:04,000\nLate cue\n"
)

VTT = (
    "WEBVTT\n\n"
    "NOTE a comment block\n\n"
    "intro\n00:01.000 --> 00:04.200\nHello <b>there</b>\n\n"
    "01:00:05.500 --> 01:00:06.000\nWith hours\n"
)


def test_srt_cues_parse_and_tolerance(spark):
    df = spark.createDataFrame([(1, SRT), (2, ""), (3, "garbage")],
                               "doc_id long, srt string")
    rows = sorted(tuple(r) for r in srt_cues(df).collect())
    assert rows == [
        (1, 0, 1000, 4200, "Hello there general Kenobi"),  # CRLF + 2-line payload
        (1, 1, 5500, 6000, "Short cue"),
        (1, 2, 3723450, 3724000, "Late cue"),  # 1h2m3.45s
    ]


def test_vtt_cues_identifier_note_and_optional_hours(spark):
    df = spark.createDataFrame([(9, VTT)], "doc_id long, vtt string")
    rows = sorted(tuple(r) for r in vtt_cues(df).collect())
    assert rows == [
        (9, 0, 1000, 4200, "Hello <b>there</b>"),
        (9, 1, 3605500, 3606000, "With hours"),
    ]


def test_align_cues_to_windows_pure_arithmetic(spark):
    df = spark.createDataFrame([(1, SRT)], "doc_id long, srt string")
    al = align_cues_to_windows(srt_cues(df), 2000)
    got = sorted((r["cue_idx"], r["window_idx"]) for r in al.collect())
    # cue 0 [1000,4200) -> windows 0,1,2; cue 1 [5500,6000) -> 2;
    # cue 2 [3723450,3724000) -> 1861
    assert got == [(0, 0), (0, 1), (0, 2), (1, 2), (2, 1861)]
    # exactly-on-boundary end stays in the prior window
    one = spark.createDataFrame(
        [(1, "1\n00:00:00,000 --> 00:00:02,000\nx\n")], "doc_id long, srt string"
    )
    got = [r["window_idx"] for r in
           align_cues_to_windows(srt_cues(one), 2000).collect()]
    assert got == [0]


def test_subtitles_plan_is_jvm_only(spark):
    """The whole parse must compile to expressions — no Python UDF
    node anywhere in the plan (this is the operator's scale story)."""
    from sif_spark.plans import plan_string

    df = spark.createDataFrame([(1, SRT)], "doc_id long, srt string")
    text = plan_string(align_cues_to_windows(srt_cues(df), 2000), "simple")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in text
