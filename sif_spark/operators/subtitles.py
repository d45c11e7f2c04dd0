"""Subtitle/transcript parsing: SRT and WebVTT cue extraction as pure
JVM expressions — the transcript half of audio/video–text alignment
in a multimodal training pipeline (pairing speech windows or sampled
frames with the text spoken over them).

Unlike the binary media decoders (Arrow-batched Python by necessity),
subtitles are text: the whole parse — block split, optional cue
index, timestamp arithmetic, payload reassembly — compiles to
`split`/`regexp_extract`/`element_at` expression trees that run
inside whole-stage codegen. No Python touches the data at any scale.

Reference parity: the reference carries arbitrary bytes in custom
column types (column_type.go:16-23) and has no text operators at all;
this is north-star surface alongside operators/text.py.

Scale notes: one `posexplode` per document (cues are
document-proportional), every derived field an expression over the
exploded row — a 100 TB transcript corpus parses scan-bound with no
shuffle at all until the caller aggregates. Malformed cue blocks
yield NULL timestamps rather than failing the task (the
`on_error="null"` philosophy at the text boundary); callers filter
`start_ms IS NOT NULL` or count NULLs as a quality signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: HH:MM:SS,mmm (SRT) or [HH:]MM:SS.mmm (WebVTT) — captures
#: (hours?, minutes, seconds, millis). SRT requires all four fields
#: with a comma; VTT allows optional hours and uses a dot.
_SRT_TS = r"(\d+):(\d{1,2}):(\d{1,2}),(\d{3})"
_VTT_TS = r"(?:(\d+):)?(\d{1,2}):(\d{1,2})\.(\d{3})"


def _ts_ms(line: Column, pattern: str, base: int) -> Column:
    """Timestamp → milliseconds. `base` is the regex group offset (1
    for the start stamp, 5 for the end stamp in the combined arrow
    pattern). Empty captures (optional VTT hours, or no match at all)
    coalesce to NULL through the try_cast chain, so a malformed line
    yields NULL ms rather than an error."""
    g = [F.regexp_extract(line, pattern, base + i) for i in range(4)]
    hours = F.coalesce(g[0].try_cast("long"), F.lit(0))
    mins, secs, ms = (x.try_cast("long") for x in g[1:])
    return (
        F.when(
            mins.isNotNull() & secs.isNotNull() & ms.isNotNull(),
            ((hours * 60 + mins) * 60 + secs) * 1000 + ms,
        )
    )


def _cues(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ts: str,
    skip_header: bool,
) -> DataFrame:
    arrow = f"{ts}\\s*-->\\s*{ts}"
    blocks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\r?\n[ \t]*\r?\n+"),
                lambda b: F.trim(b) != "",
            )
        ).alias("__bpos", "__block"),
    )
    if skip_header:
        # the WEBVTT signature block (and NOTE/STYLE blocks) carry no
        # arrow line — dropped by the same validity filter below, but
        # the signature must not consume cue numbering
        blocks = blocks.filter(~F.col("__block").rlike(r"^\s*WEBVTT"))
    lines = F.filter(
        F.split(F.col("__block"), r"\r?\n"), lambda x: F.trim(x) != ""
    )
    # the arrow line is line 1, or line 2 when line 1 is a cue
    # identifier (SRT's numeric index, WebVTT's arbitrary label)
    # try_element_at: a one-line block (WebVTT NOTE/STYLE, stray text)
    # must yield NULL, not an ANSI out-of-bounds error
    arrow_at_1 = F.coalesce(
        F.try_element_at(lines, F.lit(1)).rlike(arrow), F.lit(False)
    )
    ts_line = F.try_element_at(
        lines, F.when(arrow_at_1, 1).otherwise(2).cast("int")
    )
    first_text = F.when(arrow_at_1, 2).otherwise(3).cast("int")
    payload = F.array_join(
        F.slice(lines, first_text, F.greatest(F.size(lines), F.lit(1))), " "
    )
    cues = blocks.select(
        "__id",
        "__bpos",
        _ts_ms(ts_line, arrow, 1).alias("start_ms"),
        _ts_ms(ts_line, arrow, 5).alias("end_ms"),
        F.when(ts_line.rlike(arrow), payload).alias("text"),
    ).filter(F.col("text").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy("__id").orderBy("__bpos")
    return cues.select(
        F.col("__id").alias(id_col),
        (F.row_number().over(w) - 1).alias("cue_idx"),
        "start_ms",
        "end_ms",
        "text",
    )


def srt_cues(
    df: DataFrame, text_col: str = "srt", id_col: str = "doc_id"
) -> DataFrame:
    """Explode SRT transcripts into cue rows ``(id_col, cue_idx,
    start_ms, end_ms, text)``. Blocks split on blank lines; the
    optional index/identifier line is tolerated and ignored (cue_idx
    is positional); multi-line payloads join with single spaces;
    blocks whose first or second line is not a valid
    `HH:MM:SS,mmm --> HH:MM:SS,mmm` arrow are dropped."""
    return _cues(df, text_col, id_col, _SRT_TS, skip_header=False)


def vtt_cues(
    df: DataFrame, text_col: str = "vtt", id_col: str = "doc_id"
) -> DataFrame:
    """WebVTT variant of `srt_cues`: dot millis, optional hours, the
    WEBVTT signature block and NOTE/STYLE blocks are skipped (no
    arrow line), cue identifiers (any non-arrow first line) are
    tolerated like SRT's numeric index."""
    return _cues(df, text_col, id_col, _VTT_TS, skip_header=True)


def align_cues_to_windows(
    cues: DataFrame, window_ms: int, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every cue the media-window indices it overlaps — the
    join key for pairing transcripts with `sample_frames` output
    (frame/audio window w covers [w*window_ms, (w+1)*window_ms)).
    Pure arithmetic explode: no join, no shuffle; a cue spanning n
    windows yields n rows with the same cue columns."""
    first = (F.col("start_ms") / window_ms).cast("long")
    last = ((F.col("end_ms") - 1) / window_ms).cast("long")
    return cues.withColumn(
        "window_idx",
        F.explode(F.sequence(first, F.greatest(last, first))),
    )
