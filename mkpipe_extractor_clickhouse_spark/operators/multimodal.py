"""Multimodal column operators (BASELINE north star): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is
stubbed (``decode_image`` raises NotImplementedError; the pipeline
runs a deterministic fake featurizer instead) — but everything Spark
cares about is real and tested: the binary+struct schema, the
mapInPandas batch shapes, partition-count preservation, and the
downstream aggregations. Swapping the fake for PIL/ffmpeg changes one
function body, not the plan.

At 100 TB: blobs never shuffle — featurization is a narrow map, and
only the (small, fixed-width) feature rows continue into joins/aggs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register

N_HIST_BINS = 8

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        *[
            T.StructField(f"hist_{i}", T.LongType())
            for i in range(N_HIST_BINS)
        ],
    ]
)


def synthesize_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic binary fixture: utf-8 bytes of documents.text as
    the opaque payload plus a typed metadata struct — the schema shape
    a real image/audio table would have."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("blob"),
        F.struct(
            F.lit("fake/v1").alias("format"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(blob: bytes) -> "object":
    """Real decode hook — requires an image codec (PIL/opencv), which
    this container does not ship. The featurizer below uses
    fake_features() instead; swap here when codecs are available."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this environment"
    )


def fake_features(blob: bytes) -> list[float]:
    """Deterministic stand-in featurizer: byte histogram over
    N_HIST_BINS equal ranges + mean byte value. Vectorized — the blob
    never touches a per-byte Python loop (np.frombuffer is a zero-copy
    view; bincount does the binning in C), so the m1 path stays
    Arrow-fast end-to-end even as a stub."""
    if not blob:
        return [0.0] + [0.0] * N_HIST_BINS
    a = np.frombuffer(blob, dtype=np.uint8)
    # b * N // 256 == b >> 5 for N=8; keep the general form in int32
    counts = np.bincount(
        (a.astype(np.int32) * N_HIST_BINS) >> 8, minlength=N_HIST_BINS
    )
    return [float(a.mean()), *counts.astype(float).tolist()]


def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch of blobs in → one batch of
    fixed-width features out. Never materializes more than a batch;
    the whole batch's histograms come from ONE bincount over the
    concatenated blob bytes with per-blob segment ids (reduceat-style),
    not a Python loop over rows."""
    for pdf in batches:
        blobs = list(pdf["blob"])
        lengths = np.fromiter((len(b) for b in blobs), dtype=np.int64)
        cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        # per-blob segment id for every byte, then one 2-D bincount:
        # flat index = seg * N_HIST_BINS + bin
        seg = np.repeat(np.arange(len(blobs)), lengths)
        bins = (cat.astype(np.int32) * N_HIST_BINS) >> 8
        hist = np.bincount(
            seg * N_HIST_BINS + bins, minlength=len(blobs) * N_HIST_BINS
        ).reshape(len(blobs), N_HIST_BINS)
        sums = np.bincount(seg, weights=cat, minlength=len(blobs))
        means = np.divide(
            sums, lengths, out=np.zeros(len(blobs)), where=lengths > 0
        )
        # half-away-from-zero at 1e-6 (the project _Q discipline; means
        # are non-negative) — np.round's banker's rule would diverge
        # from any SQL oracle on decimal ties
        means = np.trunc(means * 1e6 + 0.5) / 1e6
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "format": [m["format"] for m in pdf["meta"]],
                "mean_byte": means,
            }
        )
        for i in range(N_HIST_BINS):
            out[f"hist_{i}"] = hist[:, i]
        yield out


@register(
    "m1_multimodal_features",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(range(1, length(text) + 1)) AS i
      FROM documents
    ),
    codes AS (
      SELECT doc_id, ascii(substr(text, i, 1)) AS code FROM pos
    ),
    agg AS (
      SELECT doc_id,
             COUNT(*) AS n_bytes,
             CAST(TRUNC(CAST(SUM(code) AS DOUBLE) / COUNT(*) * 1000000
                        + 0.5) / 1000000.0 AS DOUBLE) AS mean_byte,
             {", ".join(
                 f"COUNT(*) FILTER (WHERE code // 32 = {b}) AS hist_{b}"
                 for b in range(8)
             )}
      FROM codes GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           'fake/v1' AS format, mean_byte,
           {", ".join(
               f"CAST(hist_{b} AS BIGINT) AS hist_{b}" for b in range(8)
           )}
    FROM agg
    """,
    tags=("EXT", "D3", "multimodal"),
)
def m1_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode/featurize pipeline: blobs → mapInPandas →
    fixed-width features.

    ORACLE-CHECKED as of round 4 (was rows-only): the fake featurizer
    is deterministic byte math over the UTF-8 payload, so DuckDB can
    re-derive it per character — byte histogram (code DIV 32 bins) and
    1e-6-quantized mean byte (the _Q half-away rule; np.round's
    banker's ties would diverge).  The hash-match pins the WHOLE
    Arrow-batched mapInPandas path: batching, segment bincount, schema.
    Swapping fake_features for a real codec returns this row to
    rows-only (decode output has no SQL equivalent) — the plumbing
    proof stays either way."""
    return synthesize_blobs(spark, sf_dir).mapInPandas(featurize, FEATURE_SCHEMA)


@register(
    "m2_multimodal_rollup",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_blobs,
           CAST(SUM(CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
           MAX(CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT)) AS max_bytes
    FROM documents
    GROUP BY source
    """,
    tags=("EXT", "multimodal"),
)
def m2_multimodal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup over the blob table: storage accounting per
    source without ever touching payload bytes (column pruning keeps
    the binary column out of the scan)."""
    blobs = synthesize_blobs(spark, sf_dir)
    return blobs.groupBy(F.col("meta.source").alias("source")).agg(
        F.count("*").alias("n_blobs"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


@register(
    "m3_frame_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, length(text) // 64 AS n_frames FROM documents
    )
    SELECT doc_id,
           unnest(range(0, GREATEST(n_frames - 1, 0) + 1, 8)) AS frame_idx,
           unnest(range(0, GREATEST(n_frames - 1, 0) + 1, 8)) * 64
             AS byte_offset
    FROM b
    """,
    # oracle-checked as of round 4 (was rows-only): the stride
    # selection is deterministic arithmetic over n_bytes, so DuckDB
    # re-derives every (frame_idx, byte_offset) row exactly
    tags=("EXT", "multimodal"),
)
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: treat each blob as a virtual
    ``n_frames`` sequence (n_bytes div 64, last index n_frames-1),
    emit every 8th frame index
    with its byte offset — the exploded shape a video pipeline feeds to
    per-frame featurizers."""
    blobs = synthesize_blobs(spark, sf_dir)
    # last valid frame index is n_frames-1 (a bound of n_frames would
    # emit a zero-length frame starting exactly at end-of-blob)
    n_frames = F.expr("meta.n_bytes div 64")
    frames = blobs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(8))
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id", "frame_idx", (F.col("frame_idx") * 64).alias("byte_offset")
    )


@register(
    "m4_payload_dedup",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5(text) AS payload_hash FROM documents
    )
    SELECT payload_hash, COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_doc_id
    FROM h GROUP BY payload_hash
    HAVING COUNT(*) > 1
    """,
    tags=("L1", "EXT", "multimodal", "dedup"),
)
def m4_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact multimodal dedup — the first pass any image/audio
    corpus runs: hash the OPAQUE binary payload (never decode it),
    group by digest, keep the lowest doc_id per duplicate set. The
    hash is computed payload-side (md5 over the blob bytes), so the
    operator works for any modality; the oracle recomputes the same
    digest from the text the fixture blobs encode. 16-byte shuffle
    key regardless of payload size — the l1 economics on binary
    columns. At 100 TB, hashing rides the scan and only digests move."""
    blobs = synthesize_blobs(spark, sf_dir)
    h = blobs.select("doc_id", F.md5("blob").alias("payload_hash"))
    return (
        h.groupBy("payload_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


M5_L1_TAU = 2  # max L1 histogram distance for a near-dup pair

_M5_HCOLS = ",\n    ".join(
    f"COALESCE(SUM(CASE WHEN bin = {i} THEN c END), 0) AS h{i}"
    for i in range(N_HIST_BINS)
)
_M5_L1 = " + ".join(f"abs(a.h{i} - b.h{i})" for i in range(N_HIST_BINS))


@register(
    "m5_histogram_neardup",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, (unicode(substr(text, i, 1)) * {N_HIST_BINS}) // 256
               AS bin
      FROM documents, UNNEST(GENERATE_SERIES(1, LEN(text))) AS g(i)
    ),
    hist AS (SELECT doc_id, bin, COUNT(*) AS c FROM chars GROUP BY 1, 2),
    piv AS (
      SELECT doc_id, {_M5_HCOLS}, SUM(c) AS n
      FROM hist GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {_M5_L1} AS l1
    FROM piv a JOIN piv b ON a.doc_id < b.doc_id
    WHERE {_M5_L1} <= {M5_L1_TAU}
    ORDER BY doc_a, doc_b
    """,
    tags=("L2", "D3", "EXT", "multimodal", "dedup"),
)
def m5_histogram_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup over multimodal payloads: pairs of blobs
    whose FEATURE histograms (m1's Arrow-batched byte histograms —
    with a real codec, a perceptual image hash) are within L1 ≤ τ —
    the re-encode-tolerant dedup exact byte equality (m4) misses. The
    quadratic hazard is pruned by the j18 grid trick on total byte
    count: L1 ≥ |n_a − n_b|, so bucketing by n DIV τ with ±1 neighbor
    cells on the probe side is LOSSLESS, and the join is cell-keyed
    equi — never all-pairs. The oracle recomputes the histograms in
    pure SQL from the text the fixture blobs encode, so the
    hash-match also pins the numpy featurizer kernel against an
    independent implementation. Features flow from the same
    mapInPandas kernel as m1 — blobs never shuffle."""
    blobs = synthesize_blobs(spark, sf_dir)
    feats = blobs.mapInPandas(featurize, FEATURE_SCHEMA)
    hsum = sum(F.col(f"hist_{i}") for i in range(N_HIST_BINS))
    base = feats.select(
        "doc_id",
        *[f"hist_{i}" for i in range(N_HIST_BINS)],
        hsum.alias("n"),
    )
    cell = (F.col("n") / M5_L1_TAU).cast("bigint")
    probe = base.withColumn(
        "dc",
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))),
    ).select(
        *[F.col(c).alias(f"a_{c}") for c in base.columns],
        (cell + F.col("dc")).alias("cell"),
    )
    index = base.select(
        *[F.col(c).alias(f"b_{c}") for c in base.columns],
        cell.alias("cell"),
    )
    l1 = sum(
        F.abs(F.col(f"a_hist_{i}") - F.col(f"b_hist_{i}"))
        for i in range(N_HIST_BINS)
    )
    return (
        probe.join(index, "cell")
        .filter(
            (F.col("a_doc_id") < F.col("b_doc_id")) & (l1 <= M5_L1_TAU)
        )
        .select(
            F.col("a_doc_id").alias("doc_a"),
            F.col("b_doc_id").alias("doc_b"),
            l1.alias("l1"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


AUDIO_FRAME = 64  # fake-PCM frame length in bytes
AUDIO_TOP_FRAMES = 3

ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def frame_energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: blobs → per-frame signal energy. The payload
    bytes play the role of unsigned 8-bit PCM samples; each FULL
    64-byte frame's energy is Σ(sample−128)² — pure integer math, so
    the SQL oracle re-derives it exactly. Vectorized per batch: one
    concatenation, one reshape-free segmented reduction via bincount
    on (blob, frame) ids; the tail partial frame is dropped (a real
    hop-framed STFT does the same)."""
    for pdf in batches:
        blobs = list(pdf["blob"])
        doc_ids = pdf["doc_id"].to_numpy()
        lengths = np.fromiter((len(b) for b in blobs), dtype=np.int64)
        n_frames = lengths // AUDIO_FRAME
        cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        seg = np.repeat(np.arange(len(blobs)), lengths)
        # byte offset within its own blob, then frame id; bytes past
        # the last full frame get a sentinel bucket that is sliced off
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        off = np.arange(cat.size) - np.repeat(starts, lengths)
        frame = off // AUDIO_FRAME
        in_full = frame < np.repeat(n_frames, lengths)
        sq = (cat.astype(np.int64) - 128) ** 2
        # flat (blob, frame) key over only in-full-frame bytes
        frame_base = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
        flat = np.repeat(frame_base, lengths) + frame
        energies = np.bincount(
            flat[in_full],
            weights=sq[in_full],
            minlength=int(n_frames.sum()),
        ).astype(np.int64)
        out_doc = np.repeat(doc_ids, n_frames)
        out_idx = np.arange(int(n_frames.sum())) - np.repeat(
            frame_base, n_frames
        )
        yield pd.DataFrame(
            {"doc_id": out_doc, "frame_idx": out_idx, "energy": energies}
        )


@register(
    "m6_audio_frame_energy",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
      FROM documents
    ),
    codes AS (
      SELECT doc_id,
             (i - 1) // {AUDIO_FRAME} AS frame_idx,
             ascii(substr(text, i, 1)) AS code,
             length(text) // {AUDIO_FRAME} AS n_frames
      FROM pos
    ),
    fe AS (
      SELECT doc_id, frame_idx,
             SUM((code - 128) * (code - 128)) AS energy
      FROM codes WHERE frame_idx < n_frames
      GROUP BY doc_id, frame_idx
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rank,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(energy AS BIGINT) AS energy
    FROM (
      SELECT doc_id, frame_idx, energy,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY energy DESC, frame_idx) AS rnk
      FROM fe
    ) WHERE rnk <= {AUDIO_TOP_FRAMES}
    ORDER BY doc_id, rank
    """,
    tags=("EXT", "D3", "W8", "multimodal", "audio"),
)
def m6_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped multimodal op: loudest-frames detection. Blobs play
    unsigned 8-bit PCM; the Arrow-batched mapInPandas kernel emits one
    integer energy per full 64-byte frame (module kernel: segmented
    bincount, no Python loop), then a per-doc window keeps the top-3
    loudest frames — the clip-selection step an audio curation
    pipeline runs before expensive transcription. All-integer energies
    make the whole path oracle-checkable; the blob itself never
    shuffles (energies are 24 bytes/frame, frames leave the map
    already reduced). The real decoder stays behind the documented
    codec gate (decode_image pattern); this pins the batching, offset
    arithmetic, and tail-frame semantics a real PCM kernel needs."""
    blobs = synthesize_blobs(spark, sf_dir)
    fe = blobs.mapInPandas(frame_energies, schema=ENERGY_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("energy"), "frame_idx")
    return (
        fe.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= AUDIO_TOP_FRAMES)
        .select("doc_id", "rank", "frame_idx", "energy")
        .orderBy("doc_id", "rank")
    )


@register(
    "m7_shot_boundaries",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
      FROM documents
    ),
    codes AS (
      SELECT doc_id,
             (i - 1) // {AUDIO_FRAME} AS frame_idx,
             ascii(substr(text, i, 1)) AS code,
             length(text) // {AUDIO_FRAME} AS n_frames
      FROM pos
    ),
    fe AS (
      SELECT doc_id, frame_idx,
             SUM((code - 128) * (code - 128)) AS energy
      FROM codes WHERE frame_idx < n_frames
      GROUP BY doc_id, frame_idx
    ),
    d AS (
      SELECT doc_id, frame_idx, energy,
             LAG(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS prev
      FROM fe
    ),
    ad AS (
      SELECT doc_id, frame_idx, ABS(energy - prev) AS adelta,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_d,
             SUM(ABS(energy - prev)) OVER (PARTITION BY doc_id) AS s_d
      FROM d WHERE prev IS NOT NULL
    )
    SELECT doc_id,
           MAX(n_d) + 1 AS n_frames,
           SUM(CASE WHEN adelta * n_d > 2 * s_d THEN 1 ELSE 0 END) + 1
             AS n_shots,
           SUM(CASE WHEN adelta * n_d > 2 * s_d
                    THEN frame_idx ELSE 0 END) AS boundary_checksum,
           MAX(adelta) AS max_delta
    FROM ad GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("EXT", "D3", "W3", "multimodal", "video"),
)
def m7_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped multimodal op: SHOT-BOUNDARY detection — the frame
    where the signal jumps is where a curation pipeline cuts clips and
    samples keyframes (m3 picks frames, this picks CUTS). Reuses the
    m6 Arrow kernel (bytes → per-frame integer energies, blob reduced
    map-side), then a per-doc lag gives consecutive energy deltas and
    a frame is a boundary when its |delta| exceeds 2× the doc's mean
    |delta| — compared as the integer cross-product |Δ|·n > 2·ΣΔ, so
    no division and the oracle matches bit-for-bit. Output per doc:
    frame count, shot count, a boundary-position checksum, and the
    sharpest cut. Scale: the heavy bytes never shuffle; the window
    state is one doc's frame list (bounded by clip length, like any
    real shot detector)."""
    blobs = synthesize_blobs(spark, sf_dir)
    fe = blobs.mapInPandas(frame_energies, schema=ENERGY_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = (
        fe.withColumn("prev", F.lag("energy").over(w))
        .filter(F.col("prev").isNotNull())
        .withColumn("adelta", F.abs(F.col("energy") - F.col("prev")))
    )
    wd = Window.partitionBy("doc_id")
    ad = d.withColumn("n_d", F.count("*").over(wd)).withColumn(
        "s_d", F.sum("adelta").over(wd)
    )
    flag = F.expr("CASE WHEN adelta * n_d > 2 * s_d THEN 1 ELSE 0 END")
    return (
        ad.groupBy("doc_id")
        .agg(
            (F.max("n_d") + 1).alias("n_frames"),
            (F.sum(flag) + 1).alias("n_shots"),
            F.sum(
                F.expr(
                    "CASE WHEN adelta * n_d > 2 * s_d "
                    "THEN frame_idx ELSE 0 END"
                )
            ).alias("boundary_checksum"),
            F.max("adelta").alias("max_delta"),
        )
        .orderBy("doc_id")
    )


# Magic-byte signatures for the m8 sniffer (public file-format magic
# numbers: PNG RFC 2083 §12.12, JPEG/JFIF SOI marker, RIFF/WAVE).
# RIFF is a CONTAINER magic — WebP and AVI share it — so the WAV
# fixture header carries the full 12-byte 'RIFF'+size+'WAVE' preamble
# (size field zeroed: sniffers key on the two tags, not the length)
# and the sniffer requires bytes 8-12 == 'WAVE' before classifying as
# audio/wav (ADVICE r7).
MAGIC_HEADERS = (
    ("89504e470d0a1a0a", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("524946460000000057415645", "audio/wav"),  # 'RIFF'....'WAVE'
)
_FMTS = tuple(f for _, f in MAGIC_HEADERS)

SNIFF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("declared_format", T.StringType()),
        T.StructField("sniffed_format", T.StringType()),
    ]
)


def synthesize_typed_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-format binary fixture: each doc's payload
    gets a REAL magic-byte header (PNG/JPEG/RIFF by doc_id mod 3)
    prepended to its utf-8 bytes, and a DECLARED format in the
    metadata struct that is deliberately wrong for doc_id % 10 == 0 —
    the corrupted-upload / mislabeled-asset case a multimodal QA gate
    exists to catch."""
    d = load_table(spark, sf_dir, "documents")
    true_idx = F.col("doc_id") % 3
    decl_idx = (F.col("doc_id") % 3 + F.when(
        F.col("doc_id") % 10 == 0, F.lit(1)
    ).otherwise(F.lit(0))) % 3
    def fmt_case(idx):
        c = F.when(idx == 0, F.lit(_FMTS[0])).when(idx == 1, F.lit(_FMTS[1]))
        return c.otherwise(F.lit(_FMTS[2]))
    header = (
        F.when(true_idx == 0, F.unhex(F.lit(MAGIC_HEADERS[0][0])))
        .when(true_idx == 1, F.unhex(F.lit(MAGIC_HEADERS[1][0])))
        .otherwise(F.unhex(F.lit(MAGIC_HEADERS[2][0])))
    )
    return d.select(
        "doc_id",
        F.concat(header, F.encode("text", "utf-8")).alias("blob"),
        F.struct(
            fmt_case(decl_idx).alias("format"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def sniff_formats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: classify each blob by its leading magic
    bytes — the payload itself is the witness, independent of any
    metadata. Prefix-compare only (blob[:12] per row — 12 bytes so the
    RIFF branch can verify the 'WAVE' form tag); payloads are never
    copied or decoded."""
    # PNG/JPEG are plain prefix magics; RIFF is a container shared by
    # WebP/AVI, so audio/wav additionally requires the 'WAVE' form tag
    # at bytes 8-12 (the size field at 4-8 is ignored, like file(1)).
    magics = [
        (bytes.fromhex(h), f)
        for h, f in MAGIC_HEADERS
        if f != "audio/wav"
    ]
    for pdf in batches:
        sniffed = []
        for b in pdf["blob"]:
            head = bytes(b[:12])
            for m, f in magics:
                if head.startswith(m):
                    sniffed.append(f)
                    break
            else:
                if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
                    sniffed.append("audio/wav")
                else:
                    sniffed.append("unknown")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "declared_format": [m["format"] for m in pdf["meta"]],
                "sniffed_format": sniffed,
            }
        )


@register(
    "m8_format_sniff",
    # The oracle recomputes declared/sniffed from the SAME doc_id
    # arithmetic the fixture builder uses (m1 precedent: the fixture
    # formula is part of the contract); the Spark side actually
    # pattern-matches the payload bytes.
    oracle="""
    WITH fmts(idx, fmt) AS (VALUES
      (0, 'image/png'), (1, 'image/jpeg'), (2, 'audio/wav')),
    rows_ AS (
      SELECT d.doc_id,
             fd.fmt AS declared_format,
             ft.fmt AS sniffed_format
      FROM documents d
      JOIN fmts ft ON ft.idx = d.doc_id % 3
      JOIN fmts fd ON fd.idx =
        (d.doc_id % 3 + CASE WHEN d.doc_id % 10 = 0 THEN 1 ELSE 0 END) % 3
    )
    SELECT declared_format, sniffed_format,
           declared_format = sniffed_format AS is_match,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id
    FROM rows_
    GROUP BY declared_format, sniffed_format
    ORDER BY declared_format, sniffed_format
    """,
    tags=("EXT", "D3", "multimodal", "dq"),
)
def m8_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal QA gate: magic-byte sniffing of every payload versus
    its DECLARED metadata format — mislabeled or corrupted assets
    surface as (declared, sniffed) mismatch classes.  The sniffer is a
    narrow mapInPandas over the blob column (first 12 bytes per row, no
    decode, no shuffle of payload bytes); only the tiny classification
    rows aggregate.  At 100 TB this is the cheapest possible pass over
    a binary corpus: one scan, prefix-compare, fixed-width output."""
    blobs = synthesize_typed_blobs(spark, sf_dir)
    sn = blobs.mapInPandas(sniff_formats, schema=SNIFF_SCHEMA)
    return (
        sn.groupBy("declared_format", "sniffed_format")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .select(
            "declared_format",
            "sniffed_format",
            (F.col("declared_format") == F.col("sniffed_format")).alias(
                "is_match"
            ),
            "n_docs",
            "min_doc_id",
        )
        .orderBy("declared_format", "sniffed_format")
    )


# ---- m9: content-defined chunking dedup (storage-level) --------------

CDC_B = 257
CDC_P = 1_000_000_007
CDC_WIN = 8  # rolling window bytes
CDC_DIV = 64  # boundary when h % CDC_DIV == 0 → ~64-byte avg chunks
_CDC_BK = [pow(CDC_B, k, CDC_P) for k in range(CDC_WIN)]

_M9_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_start", T.IntegerType()),
        T.StructField("chunk_len", T.IntegerType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)


def cdc_chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: content-defined chunk boundaries over raw
    payload bytes — the casync/restic/LBFS split. The rolling hash is
    a {CDC_WIN}-byte polynomial mod {CDC_P}, computed for the WHOLE
    Arrow batch as {CDC_WIN} shifted vector multiplies (no per-byte
    Python); a boundary closes a chunk after byte i when
    h(i) % {CDC_DIV} == 0. Chunk digests come from hashlib per chunk —
    the same per-chunk hash a real CDC store pays."""
    import hashlib

    for pdf in batches:
        blobs = list(pdf["blob"])
        doc_ids = pdf["doc_id"].to_numpy()
        lengths = np.fromiter((len(b) for b in blobs), dtype=np.int64)
        cat = np.frombuffer(b"".join(blobs), dtype=np.uint8).astype(np.int64)
        h = np.zeros(len(cat), dtype=np.int64)
        for k, bk in enumerate(_CDC_BK):
            if k == 0:
                h += cat * bk
            else:
                h[k:] += cat[:-k] * bk
        h %= CDC_P
        starts_of_blob = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        pos1 = np.arange(len(cat)) - np.repeat(starts_of_blob, lengths) + 1
        is_boundary = (pos1 >= CDC_WIN) & (h % CDC_DIV == 0)
        out = {"doc_id": [], "chunk_start": [], "chunk_len": [],
               "chunk_md5": []}
        offset = 0
        for row, blob in enumerate(blobs):
            n = lengths[row]
            ends = (
                np.flatnonzero(is_boundary[offset:offset + n]) + 1
            ).tolist()
            if not ends or ends[-1] != n:
                ends.append(int(n))
            prev = 0
            for e in ends:
                chunk = blob[prev:e]
                out["doc_id"].append(int(doc_ids[row]))
                out["chunk_start"].append(prev + 1)
                out["chunk_len"].append(e - prev)
                out["chunk_md5"].append(hashlib.md5(chunk).hexdigest())
                prev = e
            offset += n
        yield pd.DataFrame(out)


_M9_LAGS = " + ".join(
    f"COALESCE(LAG(c, {k}) OVER w, 0) * {bk}" if k else f"c * {bk}"
    for k, bk in enumerate(_CDC_BK)
)


@register(
    "m9_cdc_chunk_dedup",
    oracle=f"""
    -- Byte-wise oracle (ADVICE r9): the Spark kernel chunks the UTF-8
    -- BYTES of text, so the oracle walks hex(encode(text)) — byte i is
    -- hex digits [2i-1, 2i] — rather than CHARACTERS; any multi-byte
    -- character now chunks identically across engines. The chunk key
    -- is md5 over the chunk's hex digits (DuckDB lacks md5(BLOB));
    -- digests never surface in the output — only chunk IDENTITY
    -- matters, and hex is injective on byte strings.
    WITH hx AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    ),
    pos AS (
      SELECT doc_id, hx, unnest(range(1, nb + 1)) AS i FROM hx
    ),
    codes AS (
      SELECT doc_id, i,
             CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS c
      FROM pos
    ),
    h AS (
      SELECT doc_id, i, ({_M9_LAGS}) % {CDC_P} AS h
      FROM codes WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    ends AS (
      SELECT doc_id, i AS e FROM h
      WHERE i >= {CDC_WIN} AND h % {CDC_DIV} = 0
      UNION
      SELECT doc_id, nb AS e FROM hx
    ),
    chunks AS (
      SELECT doc_id,
             COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1
               AS s,
             e
      FROM ends
    ),
    hashed AS (
      SELECT md5(substr(x.hx, 2 * c.s - 1, (2 * (c.e - c.s + 1))::INT))
               AS ch,
             c.e - c.s + 1 AS len
      FROM chunks c JOIN hx x USING (doc_id)
    ),
    g AS (SELECT ch, COUNT(*) AS cnt, MIN(len) AS len FROM hashed GROUP BY ch)
    SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks,
           COUNT(*) AS n_unique_chunks,
           CAST(SUM(cnt * len) AS BIGINT) AS total_bytes,
           CAST(SUM(len) AS BIGINT) AS unique_bytes,
           CAST((SUM(cnt * len) - SUM(len)) * 1000000 // SUM(cnt * len)
                AS BIGINT) AS savings_ppm,
           CAST(SUM(cnt * len) // SUM(cnt) AS BIGINT) AS avg_chunk_bytes
    FROM g
    """,
    tags=("EXT", "D3", "multimodal", "dedup"),
)
def m9_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup — the STORAGE-level dedup every
    large binary corpus runs under the analytics layer (LBFS/rsync →
    casync/restic/borg): split each opaque payload at rolling-hash
    boundaries so shared byte runs chunk identically regardless of
    offset shifts, hash the chunks, and measure how many bytes a
    content-addressed chunk store would keep vs raw storage.  This is
    the pure content-defined variant (no min/max clamp), which keeps
    the boundary rule order-free: boundary after byte i whenever the
    {CDC_WIN}-byte polynomial hash ≡ 0 mod {CDC_DIV} (≈{CDC_DIV}-byte
    average chunks), plus a forced end-of-payload boundary.

    The Spark side chunks BYTES in a vectorized mapInPandas kernel
    (the m-family pattern: {CDC_WIN} shifted vector multiplies per
    Arrow batch, hashlib per chunk — what a real chunk store pays);
    the oracle re-derives the identical boundaries RELATIONALLY from
    the text the fixture blobs encode (LAG-window polynomial), so the
    hash-match proves the kernel against an independent formulation.
    At 100 TB: chunking rides the scan; only (digest, len) pairs — a
    few % of payload volume — shuffle to the chunk-store ledger."""
    blobs = synthesize_blobs(spark, sf_dir).select("doc_id", "blob")
    chunks = blobs.mapInPandas(cdc_chunker, schema=_M9_SCHEMA)
    g = chunks.groupBy("chunk_md5").agg(
        F.count("*").alias("cnt"), F.min("chunk_len").alias("len")
    )
    return g.agg(
        F.sum("cnt").alias("n_chunks"),
        F.count("*").alias("n_unique_chunks"),
        F.sum(F.col("cnt") * F.col("len")).alias("total_bytes"),
        F.sum("len").alias("unique_bytes"),
        F.expr(
            "(sum(cnt * len) - sum(len)) * 1000000 div sum(cnt * len)"
        ).alias("savings_ppm"),
        F.expr("sum(cnt * len) div sum(cnt)").alias("avg_chunk_bytes"),
    )
