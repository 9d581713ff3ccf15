"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (image/audio libraries are not in this
container): `decode_image` raises NotImplementedError, and
`fake_image_features` provides a deterministic stand-in so the Spark
plumbing — schema, batch shape, partitioning — is real and tested.
At scale the pattern matters more than the codec: binary payloads never
pass through Python row-by-row; they move as Arrow record batches, and
per-file metadata (byte size, checksum) is computed JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an opaque binary column with typed metadata (JVM-side)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(payload_col).alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload_col).cast("long").alias("byte_size"),
        F.md5(payload_col).alias("checksum"),
    )


def decode_image(payload: bytes) -> object:
    """Real decode would use PIL/libvips — not available here."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this environment; "
        "use fake_image_features for pipeline testing"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_image_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Deterministic stand-in for decode+feature-extract: 'dimensions'
    and a feature vector derived from the payload bytes. Runs through
    mapInPandas exactly as a real decoder would (Arrow batches in,
    Arrow batches out) — swap the body for PIL/torch when available."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["payload"].map(len)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (sizes % 640 + 1).astype("int32"),
                    "height": (sizes % 480 + 1).astype("int32"),
                    "feature": [
                        [float((s + i) % 255) / 255.0 for i in range(feat_dim)] for s in sizes
                    ],
                }
            )
            yield out

    return media.mapInPandas(extract, FEATURE_SCHEMA)


# --- registered queries --------------------------------------------------

_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS byte_size,
       md5(text) AS checksum,
       'text/plain' AS media_type
FROM documents
"""


@query("binary_metadata", _META_SQL)
def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata computed JVM-side (documents' text encoded
    to bytes stands in for an image payload)."""
    d = read_table(spark, sf_dir, "documents")
    media = to_media_table(
        d.withColumn("payload", F.encode("text", "UTF-8")), "doc_id", "payload", "text/plain"
    )
    return media.select("doc_id", "byte_size", "checksum", "media_type")


# the stub decode is deterministic arithmetic on the payload byte size,
# so the flat feature table has an exact SQL oracle — the Arrow/
# mapInPandas plumbing is what the query actually exercises
_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
       CAST(8 AS INTEGER) AS feat_dim
FROM documents
"""


@query("multimodal_features", _FEATURES_SQL)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline shape: binary wrap -> Arrow-batched
    feature extraction (stubbed decode) -> flat feature table."""
    d = read_table(spark, sf_dir, "documents")
    media = to_media_table(
        d.withColumn("payload", F.encode("text", "UTF-8")), "doc_id", "payload", "image/fake"
    )
    feats = fake_image_features(media)
    return feats.select("doc_id", "width", "height", F.size("feature").alias("feat_dim"))


# --- binary format + byte-statistics profile (PIL-free, gated) -----------

# Real magic-byte prefixes (public file-format signatures); the fixture
# stamps one onto each encoded-text payload by doc_id % 4, so format
# DETECTION — the real operator — runs on genuine signatures even
# though the bodies are synthetic. Detection + histogram need no
# imaging library: this is the multimodal op that is fully exact and
# DuckDB-oracle-able (entropy's ln is not gateable cross-libm; the
# collision probability sum(c^2)/n^2 — Simpson index — carries the
# same concentration signal as exact integers through ONE division).
_MAGIC = {
    0: b"\x89PNG\r\n\x1a\n",  # PNG 8-byte signature
    1: b"\xff\xd8\xff\xe0",  # JPEG/JFIF SOI + APP0
    2: b"GIF89a",  # GIF header
    3: b"RIFF\x00\x00\x00\x00WAVE",  # RIFF container, WAVE form type
}


def _stamped_payload() -> F.Column:
    pl = F.encode("text", "UTF-8")
    c = F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit(_MAGIC[0]), pl))
    c = c.when(F.col("doc_id") % 4 == 1, F.concat(F.lit(_MAGIC[1]), pl))
    c = c.when(F.col("doc_id") % 4 == 2, F.concat(F.lit(_MAGIC[2]), pl))
    return c.otherwise(F.concat(F.lit(_MAGIC[3]), pl))


def detect_format(hx: F.Column) -> F.Column:
    """Container format from the payload's hex string (magic bytes):
    PNG / JPEG (any APPn marker) / GIF89a / RIFF-WAVE (form type at
    byte offset 8), else octet-stream. Pure string prefix tests —
    JVM-side, codegen-friendly."""
    return (
        F.when(F.substring(hx, 1, 16) == "89504E470D0A1A0A", "image/png")
        .when(F.substring(hx, 1, 6) == "FFD8FF", "image/jpeg")
        .when(F.substring(hx, 1, 12) == "474946383961", "image/gif")
        .when(
            (F.substring(hx, 1, 8) == "52494646")
            & (F.substring(hx, 17, 8) == "57415645"),
            "audio/wav",
        )
        .otherwise("application/octet-stream")
    )


def payload_byte_profile(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-payload format + byte-statistics profile over an opaque
    binary column: (id, format, n_bytes, distinct_bytes, top_byte,
    top_byte_count, byte_collision_prob). Everything is exact integer
    arithmetic — the byte histogram via explode + two map-side-
    combinable keyed aggregations (bytes collapse to <=256 rows per
    payload per partition before any shuffle), the (count, byte) argmax
    as the single BIGINT key c*256 + (255 - byte) (ties to the SMALLEST
    byte — both engines take MAX of the same integers), and the
    collision probability sum(c^2)/n^2 as one IEEE division. The hex
    detour exists because Spark has no byte-at() on BINARY; conv()
    parses each 2-hex-char slice back to its byte value.

    NULL and zero-length payloads are NOT observations — both twins
    drop them (there is no format, modal byte or collision probability
    of nothing, and Spark's sequence(0, n-1) at n=0 would fabricate a
    descending [0, -1] range of phantom bytes).

    At 100 TB, payloads should not become rows at all —
    payload_byte_profile_pandas computes the identical profile with one
    numpy bincount per payload inside Arrow batches (equality-tested);
    this JVM form is the gateable twin."""
    h = media.filter(
        F.col(payload_col).isNotNull() & (F.length(payload_col) > 0)
    ).select(
        F.col(id_col).alias("doc_id"),
        F.hex(payload_col).alias("hx"),
        F.length(payload_col).cast("long").alias("n"),
    )
    fmt = h.select("doc_id", detect_format(F.col("hx")).alias("format"))
    b = h.select(
        "doc_id",
        "hx",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("i"),
    ).select(
        "doc_id",
        F.conv(F.expr("substring(hx, i * 2 + 1, 2)"), 16, 10)
        .cast("int")
        .alias("byte"),
    )
    hist = b.groupBy("doc_id", "byte").agg(F.count(F.lit(1)).alias("c"))
    stats = hist.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bytes"),
        F.count(F.lit(1)).cast("long").alias("distinct_bytes"),
        F.max(F.col("c") * 256 + (255 - F.col("byte"))).alias("mk"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sumsq"),
    )
    return fmt.join(stats, "doc_id").select(
        "doc_id",
        "format",
        "n_bytes",
        "distinct_bytes",
        (255 - F.col("mk") % 256).cast("int").alias("top_byte"),
        F.expr("mk div 256").cast("long").alias("top_byte_count"),
        (
            F.col("sumsq").cast("double")
            / (F.col("n_bytes") * F.col("n_bytes")).cast("double")
        ).alias("byte_collision_prob"),
    )


def payload_byte_profile_pandas(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """The 100 TB shape of payload_byte_profile: payload bytes NEVER
    become rows — each Arrow batch is profiled with one numpy bincount
    per payload (O(bytes) local work, zero shuffle), exactly how a real
    decoder stage would sit. Bit-identical to the JVM/gated twin
    (equality-tested): same integers, same single division."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("distinct_bytes", T.LongType()),
            T.StructField("top_byte", T.IntegerType()),
            T.StructField("top_byte_count", T.LongType()),
            T.StructField("byte_collision_prob", T.DoubleType()),
        ]
    )
    sigs = [
        (b"\x89PNG\r\n\x1a\n", None, "image/png"),
        (b"\xff\xd8\xff", None, "image/jpeg"),
        (b"GIF89a", None, "image/gif"),
        (b"RIFF", b"WAVE", "audio/wav"),
    ]

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # NULL payload: not an observation
                buf = bytes(payload)
                if not buf:
                    continue  # empty payload: same drop as the JVM twin
                fmt = "application/octet-stream"
                for head, at8, name in sigs:
                    if buf.startswith(head) and (
                        at8 is None or buf[8:12] == at8
                    ):
                        fmt = name
                        break
                counts = np.bincount(
                    np.frombuffer(buf, dtype=np.uint8), minlength=256
                ).astype(np.int64)
                nz = np.nonzero(counts)[0]
                mk = int((counts[nz] * 256 + (255 - nz)).max())
                n = len(buf)
                rows.append(
                    (
                        int(did),
                        fmt,
                        n,
                        int(len(nz)),
                        255 - mk % 256,
                        mk // 256,
                        float(int((counts * counts).sum())) / float(n * n),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in schema.fields],
            )

    return media.select(id_col, payload_col).mapInPandas(profile, schema)


_FORMAT_PROFILE_SQL = r"""
WITH m AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN '\x89PNG\x0D\x0A\x1A\x0A'::BLOB || encode(text)
           WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
           WHEN 2 THEN 'GIF89a'::BLOB || encode(text)
           ELSE 'RIFF\x00\x00\x00\x00WAVE'::BLOB || encode(text)
         END AS p
  FROM documents
), h AS (
  SELECT doc_id, hex(p) AS hx, octet_length(p) AS n FROM m
), fmt AS (
  SELECT doc_id,
         CASE
           WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
           WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
           WHEN substr(hx, 1, 12) = '474946383961' THEN 'image/gif'
           WHEN substr(hx, 1, 8) = '52494646'
                AND substr(hx, 17, 8) = '57415645' THEN 'audio/wav'
           ELSE 'application/octet-stream'
         END AS format
  FROM h
), pos AS (
  SELECT doc_id, hx, unnest(generate_series(0, n - 1)) AS i FROM h
), b AS (
  SELECT doc_id, ('0x' || substr(hx, i * 2 + 1, 2))::INT AS byte FROM pos
), hist AS (
  SELECT doc_id, byte, COUNT(*) AS c FROM b GROUP BY 1, 2
), stats AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_bytes,
         CAST(COUNT(*) AS BIGINT) AS distinct_bytes,
         CAST(MAX(c * 256 + (255 - byte)) AS BIGINT) AS mk,
         CAST(SUM(c * c) AS BIGINT) AS sumsq
  FROM hist GROUP BY doc_id
)
SELECT f.doc_id, f.format, s.n_bytes, s.distinct_bytes,
       CAST(255 - (mk % 256) AS INT) AS top_byte,
       CAST(mk // 256 AS BIGINT) AS top_byte_count,
       CAST(sumsq AS DOUBLE) / CAST(n_bytes * n_bytes AS DOUBLE)
         AS byte_collision_prob
FROM fmt f JOIN stats s USING (doc_id)
"""


@query("binary_format_profile", _FORMAT_PROFILE_SQL)
def binary_format_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte format detection + exact byte-statistics profile over
    a binary media column — the multimodal op that needs NO imaging
    library: payloads are documents' text stamped with REAL format
    signatures (PNG/JPEG/GIF/RIFF-WAVE by doc_id % 4), detection reads
    the genuine magic bytes, and the histogram stats (distinct bytes,
    modal byte with deterministic ties, Simpson collision probability)
    are exact integers with one pinned division. The corruption/
    mislabel screen a multimodal ingest runs before ever decoding."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    media = to_media_table(
        d.withColumn("payload", _stamped_payload()),
        "doc_id",
        "payload",
        "mixed",
    )
    return payload_byte_profile(media)


# --- WAV/RIFF header parsing (typed metadata from binary, gated) ---------

# The metadata-extraction half of a multimodal ingest: read the typed
# fields OUT of the container header (sample rate, channels, bit
# depth, data size -> duration) without decoding a single sample. The
# fixture synthesizes canonical 44-byte PCM WAV headers (RIFF spec is
# public) around the text payloads with doc_id-varied parameters, and
# every 1/17th doc deliberately gets a headerless payload so the
# validity branch is under the oracle too. All parsed fields are exact
# integers; duration_us is one truncating integer division (identical
# in Spark `div` and DuckDB `//`).


def _hex2(e: str) -> str:
    return f"lpad(hex(({e}) % 256), 2, '0')"


def _le_hex(e: str, nbytes: int) -> str:
    """Little-endian hex of an unsigned integer expression — built from
    functions Spark SQL and DuckDB share (hex/lpad/concat/floor; the
    engines' integer-div spellings differ, so byte shifts go through
    floor(x / 2^8i) — exact in a double for these < 2^32 values), so
    ONE fragment serves the fixture in both engines."""
    parts = [
        _hex2(
            f"({e})"
            if i == 0
            else f"CAST(floor(({e}) / {256 ** i}.0) AS BIGINT)"
        )
        for i in range(nbytes)
    ]
    return "concat(" + ", ".join(parts) + ")"


# doc_id-varied PCM parameters (8 combos) + the data chunk = the
# encoded text; chunk sizes derive from it, so the parser must read
# real little-endian sizes, not constants
_WAV_SR = ("CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000"
           " WHEN 2 THEN 22050 ELSE 44100 END")
_WAV_CH = "CAST(1 + doc_id % 2 AS INT)"
_WAV_BITS = "CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END"


def _wav_header_hex(ds: str) -> str:
    block = (
        f"(({_WAV_CH}) * CAST(floor(({_WAV_BITS}) / 8.0) AS BIGINT))"
    )
    byte_rate = f"(({_WAV_SR}) * {block})"
    return "concat(" + ", ".join(
        [
            "'52494646'",                # 'RIFF'
            _le_hex(f"36 + ({ds})", 4),  # chunk size
            "'57415645'",                # 'WAVE'
            "'666D7420'",                # 'fmt '
            _le_hex("16", 4),            # fmt chunk size (PCM)
            _le_hex("1", 2),             # audio format 1 = PCM
            _le_hex(_WAV_CH, 2),
            _le_hex(_WAV_SR, 4),
            _le_hex(byte_rate, 4),
            _le_hex(block, 2),
            _le_hex(_WAV_BITS, 2),
            "'64617461'",                # 'data'
            _le_hex(ds, 4),
        ]
    ) + ")"


def wav_header_info(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Parse canonical PCM WAV headers out of a binary column —
    (id, valid, channels, sample_rate, bits_per_sample, data_bytes,
    duration_us, n_samples), NULL fields for non-WAV payloads. Pure
    JVM hex arithmetic: each little-endian field is reassembled from
    its header bytes (conv over 2-hex-char slices), validity checks
    the RIFF/WAVE/'fmt '/PCM magic. duration_us = data_bytes * 1e6 div
    byte_rate and n_samples = data_bytes div block_align — exact
    truncating integer divisions (Spark `div` == DuckDB `//`)."""

    def b(i: int) -> F.Column:  # unsigned byte at 0-based offset i
        return F.conv(
            F.expr(f"substring(__hx, {i * 2 + 1}, 2)"), 16, 10
        ).cast("long")

    def le(i: int, n: int) -> F.Column:
        c = b(i)
        for k in range(1, n):
            c = c + b(i + k) * (256 ** k)
        return c

    # hex ONLY the 44 bytes the parser reads: F.hex over the whole
    # payload would do O(payload) work (and 2x the bytes) per row to
    # extract a fixed-size header — substring first makes it O(1)
    base = media.select(
        F.col(id_col).alias("doc_id"),
        F.hex(F.substring(F.col(payload_col), 1, 44)).alias("__hx"),
        F.length(payload_col).cast("long").alias("__n"),
    )
    head_ok = (
        (F.col("__n") >= 44)
        & (F.expr("substring(__hx, 1, 8)") == "52494646")
        & (F.expr("substring(__hx, 17, 8)") == "57415645")
        & (F.expr("substring(__hx, 25, 8)") == "666D7420")
    )
    parsed = base.select(
        "doc_id",
        "__hx",
        (head_ok & (F.when(head_ok, le(20, 2)) == 1)).alias("valid"),
    )
    g = lambda c: F.when(F.col("valid"), c)  # noqa: E731
    ch, sr = g(le(22, 2)), g(le(24, 4))
    block, bits = g(le(32, 2)), g(le(34, 2))
    ds = g(le(40, 4))
    return parsed.select(
        "doc_id",
        "valid",
        ch.cast("int").alias("channels"),
        sr.cast("int").alias("sample_rate"),
        bits.cast("int").alias("bits_per_sample"),
        ds.alias("data_bytes"),
        (ds * 1_000_000).alias("__num"),
        (sr * block).alias("__byte_rate"),
        block.alias("__block"),
    ).select(
        "doc_id",
        "valid",
        "channels",
        "sample_rate",
        "bits_per_sample",
        "data_bytes",
        F.expr("__num div __byte_rate").cast("long").alias("duration_us"),
        F.expr("data_bytes div __block").cast("long").alias("n_samples"),
    )


_WAV_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0 THEN encode(text)
              ELSE unhex({_wav_header_hex("octet_length(encode(text))")})
                   || encode(text)
         END AS p
  FROM documents
), h AS (
  SELECT doc_id, hex(p) AS hx, octet_length(p) AS n FROM m
), v AS (
  SELECT doc_id, hx,
         n >= 44
         AND substr(hx, 1, 8) = '52494646'
         AND substr(hx, 17, 8) = '57415645'
         AND substr(hx, 25, 8) = '666D7420' AS head_ok
  FROM h
), parsed AS (
  SELECT doc_id,
         ('0x' || substr(hx, 41, 2))::BIGINT
           + ('0x' || substr(hx, 43, 2))::BIGINT * 256 AS fmt_code,
         ('0x' || substr(hx, 45, 2))::BIGINT
           + ('0x' || substr(hx, 47, 2))::BIGINT * 256 AS ch,
         ('0x' || substr(hx, 49, 2))::BIGINT
           + ('0x' || substr(hx, 51, 2))::BIGINT * 256
           + ('0x' || substr(hx, 53, 2))::BIGINT * 65536
           + ('0x' || substr(hx, 55, 2))::BIGINT * 16777216 AS sr,
         ('0x' || substr(hx, 65, 2))::BIGINT
           + ('0x' || substr(hx, 67, 2))::BIGINT * 256 AS block,
         ('0x' || substr(hx, 69, 2))::BIGINT
           + ('0x' || substr(hx, 71, 2))::BIGINT * 256 AS bits,
         ('0x' || substr(hx, 81, 2))::BIGINT
           + ('0x' || substr(hx, 83, 2))::BIGINT * 256
           + ('0x' || substr(hx, 85, 2))::BIGINT * 65536
           + ('0x' || substr(hx, 87, 2))::BIGINT * 16777216 AS ds
  FROM v WHERE head_ok
)
SELECT v.doc_id,
       COALESCE(p.fmt_code = 1, FALSE) AS valid,
       CASE WHEN p.fmt_code = 1 THEN CAST(p.ch AS INT) END AS channels,
       CASE WHEN p.fmt_code = 1 THEN CAST(p.sr AS INT) END AS sample_rate,
       CASE WHEN p.fmt_code = 1 THEN CAST(p.bits AS INT) END
         AS bits_per_sample,
       CASE WHEN p.fmt_code = 1 THEN p.ds END AS data_bytes,
       CASE WHEN p.fmt_code = 1
            THEN p.ds * 1000000 // (p.sr * p.block) END AS duration_us,
       CASE WHEN p.fmt_code = 1 THEN p.ds // p.block END AS n_samples
FROM v LEFT JOIN parsed p USING (doc_id)
"""


def wav_fixture_media(d: DataFrame) -> DataFrame:
    """The WAV fixture shared by the gated queries and the twin
    equality tests: canonical doc_id-varied PCM headers around the
    encoded text, headerless payload every 17th doc."""
    ds = "octet_length(encode(text, 'UTF-8'))"
    return d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 0, F.encode("text", "UTF-8")
        ).otherwise(
            F.concat(
                F.unhex(F.expr(_wav_header_hex(ds))),
                F.encode("text", "UTF-8"),
            )
        ).alias("payload"),
    )


@query("wav_header_parse", _WAV_SQL)
def wav_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata straight from container bytes: canonical PCM WAV
    headers (RIFF chunk layout, public spec) synthesized around the
    text payloads with doc_id-varied sample rate / channels / bit
    depth, then PARSED back JVM-side — little-endian field reassembly
    from hex slices, validity via the RIFF/WAVE/'fmt '/PCM magic,
    duration and sample count as truncating integer divisions. Docs
    with doc_id % 17 == 0 carry a headerless payload and must report
    valid = false with NULL fields (the branch is under the oracle)."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return wav_header_info(wav_fixture_media(d))


# --- image dimension parsing (PNG IHDR / GIF LSD / JPEG SOF, gated) --------

# The image twin of wav_header_parse: width/height straight from the
# container header, no decoder. PNG stores them BIG-endian in the IHDR
# chunk (bytes 16-23 of the file: 8-byte signature + 4-byte length +
# 'IHDR'); GIF (87a and 89a) stores them LITTLE-endian in the logical
# screen descriptor (bytes 6-9); JPEG stores them big-endian inside the
# SOF0/SOF2 segment, which sits at a VARIABLE offset behind
# length-prefixed APPn/COM segments — the parser walks the segment
# chain (bounded unrolled hops). The fixture synthesizes all four
# headers with doc_id-derived dimensions (JPEG with 0-7 doc_id-sized
# COM segments so SOF lands at varied offsets), so the parser must
# handle both endianness conventions AND the marker walk on real
# signatures.

_IMG_W = "CAST(16 + (doc_id % 1280) AS BIGINT)"
_IMG_H = "CAST(16 + ((doc_id * 7) % 720) AS BIGINT)"

# bounded-walk honesty knobs: at most _JPEG_HOPS marker examinations,
# reading only the first _IMG_PREFIX payload bytes (hex'd once) — a
# SOF deeper than either reports NULL dims rather than a wrong guess.
# The fixture plants one arm past the hop bound (doc_id % 31) to keep
# the honest branch under the oracle.
_JPEG_HOPS = 6
_IMG_PREFIX = 512


def _be_hex(e: str, nbytes: int) -> str:
    parts = [
        _hex2(
            f"({e})"
            if i == 0
            else f"CAST(floor(({e}) / {256 ** i}.0) AS BIGINT)"
        )
        for i in range(nbytes)
    ]
    return "concat(" + ", ".join(reversed(parts)) + ")"


def _img_payload_hex() -> str:
    """Hex of a minimal synthetic image header (shared Spark/DuckDB
    fragment), rotating real container layouts by doc_id % 4:
    0 -> PNG signature + IHDR (BE dims); 1 -> JPEG: SOI + APP0/JFIF +
    0-7 COM segments of doc_id-varied length + SOF0 (BE dims) — the
    marker walk must hop real length-prefixed segments to find it, and
    the doc_id % 31 arm buries SOF behind 7 COMs (past the hop bound,
    exercising the honest-NULL branch); 2 -> GIF89a, 3 -> GIF87a (LE
    dims). doc_id % 23 == 0 gets a 0x00-led headerless payload
    (format 'unknown'). The text payload follows as opaque body bytes
    (parsers never read past the header)."""
    png = (
        "concat('89504E470D0A1A0A', '0000000D', '49484452', "
        f"{_be_hex(_IMG_W, 4)}, {_be_hex(_IMG_H, 4)}, '0802000000')"
    )
    # one COM segment: marker FFFE + BE16 length (2 + pad) + pad 'A's;
    # pad = 1 + doc_id % 7 so segment sizes (and the SOF offset) vary
    com = (
        "concat('FFFE', "
        f"{_be_hex('(3 + doc_id % 7)', 2)}, "
        "repeat('41', CAST(1 + doc_id % 7 AS INT)))"
    )
    app0 = "'FFE000104A46494600010100000100010000'"  # JFIF APP0, len 16
    sof0 = (
        f"concat('FFC00011', '08', {_be_hex(_IMG_H, 2)}, "
        f"{_be_hex(_IMG_W, 2)}, '03011100021101031101')"
    )
    jpg = (
        f"concat('FFD8', {app0}, "
        f"CASE WHEN doc_id % 31 = 0 THEN repeat({com}, 7) "
        f"ELSE repeat({com}, CAST(doc_id % 3 AS INT)) END, {sof0})"
    )
    gif89 = (
        f"concat('474946383961', {_le_hex(_IMG_W, 2)}, "
        f"{_le_hex(_IMG_H, 2)}, '00')"
    )
    gif87 = (
        f"concat('474946383761', {_le_hex(_IMG_W, 2)}, "
        f"{_le_hex(_IMG_H, 2)}, '00')"
    )
    return (
        "CASE WHEN doc_id % 23 = 0 THEN '00' "
        f"WHEN doc_id % 4 = 0 THEN {png} "
        f"WHEN doc_id % 4 = 1 THEN {jpg} "
        f"WHEN doc_id % 4 = 2 THEN {gif89} "
        f"ELSE {gif87} END"
    )


def image_dims_info(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Parse (format, width, height) from PNG/GIF/JPEG headers in a
    binary column — NULL dims for anything else. Big-endian IHDR
    fields for PNG; little-endian logical-screen fields for GIF (87a
    and 89a); for JPEG a bounded SOF marker walk: starting after SOI,
    hop length-prefixed segments (marker FF xx + BE16 length) up to
    _JPEG_HOPS times until an SOF0/SOF2 marker (FFC0/FFC2) carries the
    BE dims at +5/+7. Pure hex arithmetic, JVM-side; only the first
    _IMG_PREFIX payload bytes are hex'd (headers live at the front — a
    substring-first projection keeps per-row work O(1) in payload
    size), and a SOF past the hop bound or prefix reports honest NULL
    dims, never a guess. Each hop is a named-column projection so the
    walk's expression tree stays LINEAR in _JPEG_HOPS."""

    def b(i: int) -> F.Column:
        return F.conv(
            F.expr(f"substring(__hx, {i * 2 + 1}, 2)"), 16, 10
        ).cast("long")

    def be(i: int, n: int) -> F.Column:
        c = b(i)
        for k in range(1, n):
            c = c * 256 + b(i + k)
        return c

    def le(i: int, n: int) -> F.Column:
        c = b(i)
        for k in range(1, n):
            c = c + b(i + k) * (256 ** k)
        return c

    base = media.select(
        F.col(id_col).alias("doc_id"),
        F.hex(F.substring(F.col(payload_col), 1, _IMG_PREFIX)).alias("__hx"),
        F.length(payload_col).cast("long").alias("__n"),
    )
    is_png = (F.col("__n") >= 24) & (
        F.expr("substring(__hx, 1, 16)") == "89504E470D0A1A0A"
    ) & (F.expr("substring(__hx, 25, 8)") == "49484452")
    is_gif = (F.col("__n") >= 10) & (
        F.expr("substring(__hx, 1, 12)").isin("474946383961", "474946383761")
    )
    is_jpg = (F.col("__n") >= 4) & (
        F.expr("substring(__hx, 1, 6)") == "FFD8FF"
    )
    # JPEG bounded marker walk over named columns: __jo = 0-based byte
    # offset of the marker under examination (NULL once the walk dies:
    # corrupt marker, out-of-prefix, or hops exhausted), __jw/__jh =
    # dims once an SOF marker is seen. Helpers read bytes at a COLUMN
    # offset; every reference is by name, so each hop adds O(1) nodes.
    cur = base.select(
        "doc_id",
        "__hx",
        "__n",
        is_png.alias("__png"),
        is_gif.alias("__gif"),
        is_jpg.alias("__jpg"),
        F.when(is_jpg, F.lit(2).cast("long")).alias("__jo"),
        F.lit(None).cast("long").alias("__jw"),
        F.lit(None).cast("long").alias("__jh"),
    )
    bo = lambda o: (  # noqa: E731 — byte at column-expression offset o
        f"CAST(conv(substring(__hx, CAST(({o}) * 2 + 1 AS INT), 2), 16, 10)"
        " AS BIGINT)"
    )
    for _ in range(_JPEG_HOPS):
        cur = (
            cur.withColumn(
                "__ok",
                F.expr(
                    # marker fully readable from the prefix: need bytes
                    # __jo .. __jo+8 (SOF dims end at +8)
                    "__jo IS NOT NULL AND __jw IS NULL"
                    f" AND (__jo + 9) * 2 <= length(__hx)"
                    f" AND {bo('__jo')} = 255"
                ),
            )
            .withColumn(
                "__sof",
                F.expr(f"__ok AND {bo('__jo + 1')} IN (192, 194)"),
            )
            .withColumn(
                "__jw",
                F.expr(
                    "CASE WHEN __jw IS NOT NULL THEN __jw WHEN __sof THEN "
                    f"{bo('__jo + 7')} * 256 + {bo('__jo + 8')} END"
                ),
            )
            .withColumn(
                "__jh",
                F.expr(
                    "CASE WHEN __jh IS NOT NULL THEN __jh WHEN __sof THEN "
                    f"{bo('__jo + 5')} * 256 + {bo('__jo + 6')} END"
                ),
            )
            .withColumn(
                "__jo",
                F.expr(
                    "CASE WHEN __jw IS NOT NULL THEN __jo WHEN NOT __ok "
                    "THEN CAST(NULL AS BIGINT) ELSE __jo + 2 + "
                    f"{bo('__jo + 2')} * 256 + {bo('__jo + 3')} END"
                ),
            )
        )
    return cur.select(
        "doc_id",
        F.when(F.col("__png"), "image/png")
        .when(F.col("__jpg"), "image/jpeg")
        .when(F.col("__gif"), "image/gif")
        .otherwise("unknown")
        .alias("format"),
        F.when(F.col("__png"), be(16, 4))
        .when(F.col("__gif"), le(6, 2))
        .when(F.col("__jpg"), F.col("__jw"))
        .cast("int")
        .alias("width"),
        F.when(F.col("__png"), be(20, 4))
        .when(F.col("__gif"), le(8, 2))
        .when(F.col("__jpg"), F.col("__jh"))
        .cast("int")
        .alias("height"),
    )


# the oracle derives expected output INDEPENDENTLY from the fixture
# spec (which arm each doc_id gets and what dims were stamped) — the
# same proves-the-decode pattern as wav_sample_stats: the Spark side
# must parse real header bytes (including the JPEG marker walk over
# variable-length COM segments) to reproduce these values, there is no
# shared parsing shortcut to be wrong in unison with. The doc_id % 31
# JPEG arm buries SOF behind 7 COM segments — past the walk's hop
# bound — so the honest NULL-dims branch is asserted too.
_IMG_SQL = f"""
SELECT doc_id,
       CASE WHEN doc_id % 23 = 0 THEN 'unknown'
            WHEN doc_id % 4 = 0 THEN 'image/png'
            WHEN doc_id % 4 = 1 THEN 'image/jpeg'
            ELSE 'image/gif' END AS format,
       CAST(CASE WHEN doc_id % 23 = 0 THEN NULL
                 WHEN doc_id % 4 = 1 AND doc_id % 31 = 0 THEN NULL
                 ELSE {_IMG_W} END AS INT) AS width,
       CAST(CASE WHEN doc_id % 23 = 0 THEN NULL
                 WHEN doc_id % 4 = 1 AND doc_id % 31 = 0 THEN NULL
                 ELSE {_IMG_H} END AS INT) AS height
FROM documents
"""


@query("image_dims_parse", _IMG_SQL)
def image_dims_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Width/height straight from image container headers — PNG IHDR
    (big-endian), GIF87a/GIF89a logical screen descriptor
    (little-endian) and JPEG SOF0 behind 0-7 variable-length COM
    segments (bounded marker walk) — synthesized with doc_id-derived
    dimensions around the text payloads, parsed back JVM-side with no
    decoder; the oracle restates the fixture spec independently, so
    the gate proves the parse. With wav_header_parse this completes
    the decode-free typed-metadata tier of the multimodal pillar."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return image_dims_info(image_fixture_media(d))


def image_fixture_media(d: DataFrame) -> DataFrame:
    """The synthetic image-header fixture frame (doc_id, payload) the
    gated query and the deep-header twin's equality test share."""
    return d.select(
        "doc_id",
        F.concat(
            F.unhex(F.expr(_img_payload_hex())),
            F.encode("text", "UTF-8"),
        ).alias("payload"),
    )


def _parse_image_dims_py(payload) -> tuple[str, int | None, int | None]:
    """Python mirror of image_dims_info's header parse with an
    UNBOUNDED JPEG marker walk — same signatures, same priority order,
    same honest-NULL semantics for dead walks, but SOF markers at any
    depth are reachable (real EXIF-laden phone JPEGs routinely carry
    more metadata segments than _JPEG_HOPS / deeper than
    _IMG_PREFIX)."""
    if payload is None:
        return ("unknown", None, None)
    b = bytes(payload)
    n = len(b)
    if (
        n >= 24
        and b[:8] == b"\x89PNG\r\n\x1a\x0a"
        and b[12:16] == b"IHDR"
    ):
        return (
            "image/png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if n >= 4 and b[:3] == b"\xff\xd8\xff":
        o = 2
        while o + 9 <= n and b[o] == 0xFF:
            if b[o + 1] in (0xC0, 0xC2):  # SOF0 / SOF2
                return (
                    "image/jpeg",
                    int.from_bytes(b[o + 7 : o + 9], "big"),
                    int.from_bytes(b[o + 5 : o + 7], "big"),
                )
            o = o + 2 + int.from_bytes(b[o + 2 : o + 4], "big")
        return ("image/jpeg", None, None)
    if n >= 10 and b[:6] in (b"GIF89a", b"GIF87a"):
        return (
            "image/gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    return ("unknown", None, None)


IMG_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def image_dims_pandas(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Deep-header Arrow twin of image_dims_info: the same PNG/GIF/JPEG
    header parse over the raw bytes in a mapInPandas batch, with an
    UNBOUNDED marker walk — the escape hatch for JPEGs whose SOF sits
    past _JPEG_HOPS segments or _IMG_PREFIX bytes, where the gated JVM
    twin reports honest NULL dims by design.  Equality-tested against
    image_dims_info on the gated fixture (identical wherever the
    bounded walk resolves dims; the deep walk additionally recovers
    the buried-SOF arm).  One row out per payload, O(header) work per
    row, payload bytes never become Spark rows."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt, w, h = _parse_image_dims_py(payload)
                rows.append((int(did), fmt, w, h))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMG_DIMS_SCHEMA.fields]
            )

    return media.select(id_col, payload_col).mapInPandas(
        parse, IMG_DIMS_SCHEMA
    )


# --- grouped-map applyInPandas (§2.11 plugin surface) ---------------------

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_zscore", T.DoubleType()),
    ]
)


# Quantization unit shared by the exact-sum UDAF/grouped-map operators
# and their DuckDB oracles: stats are computed over FLOOR(v*1e6 + 0.5)
# integers so every cross-partition/-engine reduction is exact integer
# arithmetic; only the final scalar expression touches floats, in the
# SAME operation shape both engines evaluate bit-identically.
_Q_UNIT = 1_000_000


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import math

    import numpy as np

    x = pdf["value"].to_numpy(dtype=np.float64)
    q = np.floor(x * _Q_UNIT + 0.5).astype(np.int64)
    n = len(q)
    pdf = pdf[["event_id", "user_id", "value"]].copy()
    # exact integer moments (Python bigints: q*q sums overflow int64)
    total = sum(int(v) for v in q)
    sumsq = sum(int(v) * int(v) for v in q)
    m2 = n * sumsq - total * total
    if n < 2 or m2 <= 0:
        pdf["value_zscore"] = 0.0
        return pdf
    mean = float(total) / (float(n) * _Q_UNIT)
    std = math.sqrt(float(m2) / (float(n) * float(n - 1)) / (_Q_UNIT * _Q_UNIT))
    pdf["value_zscore"] = (x - mean) / std
    return pdf


_ZSCORE_SQL = f"""
WITH q AS (
  SELECT event_id, user_id, value,
         CAST(FLOOR(value * {_Q_UNIT} + 0.5) AS BIGINT) AS qv
  FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n, SUM(qv) AS total, SUM(qv * qv) AS sumsq
  FROM q GROUP BY user_id
)
SELECT q.event_id, q.user_id, q.value,
       ROUND(CASE WHEN s.n < 2 OR (s.n * s.sumsq - s.total * s.total) <= 0
                  THEN 0.0
             ELSE (q.value - CAST(s.total AS DOUBLE)
                             / (CAST(s.n AS DOUBLE) * {_Q_UNIT}))
                  / SQRT(CAST(s.n * s.sumsq - s.total * s.total AS DOUBLE)
                         / (CAST(s.n AS DOUBLE) * CAST(s.n - 1 AS DOUBLE))
                         / ({_Q_UNIT}.0 * {_Q_UNIT}.0))
             END, 9) AS value_zscore
FROM q JOIN s USING (user_id)
"""


@query("group_zscore_pandas", _ZSCORE_SQL)
def group_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user z-score of event values — the
    reference's BaseDataCleaner-style plugin written as an Arrow-batched
    group transform. Promoted to an EXACT oracle: the group moments are
    exact integer sums of 1e-6-quantized values (order-independent), and
    mean/std/z are derived through the identical IEEE operation sequence
    in both engines, so the DuckDB window/join re-derivation matches
    bit-for-bit (round 9 is belt-and-braces against cast ulps)."""
    from fastetl_spark.io.readers import read_table as _rt

    e = _rt(spark, sf_dir, "events")
    z = e.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        _zscore_group, ZSCORE_SCHEMA
    )
    return z.withColumn("value_zscore", F.round("value_zscore", 9))


# --- video frame sampling -------------------------------------------------

_FRAME_FPS = 24
_FRAME_STRIDE_MS = 500

_FRAME_SQL = f"""
WITH media AS (
  SELECT doc_id,
         (octet_length(encode(text)) % 10000) + 1000 AS duration_ms
  FROM documents
)
SELECT doc_id, duration_ms,
       unnest(generate_series(0, duration_ms - 1, {_FRAME_STRIDE_MS})) AS ts_ms,
       CAST(FLOOR(unnest(generate_series(0, duration_ms - 1, {_FRAME_STRIDE_MS}))
                  * {_FRAME_FPS} / 1000.0) AS BIGINT) AS frame_idx
FROM media
"""


@query("video_frame_sample", _FRAME_SQL)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video columns: each media row expands
    to its sampled frame timeline (one row per stride tick, with the
    source frame index at the container fps). The expansion is pure
    JVM-side arithmetic — sequence + explode, no Python; only the
    per-frame DECODE belongs in mapInPandas (see fake_image_features for
    that stage's shape). Duration is derived deterministically from the
    payload since the fixture has no real containers; the timeline math
    is the real operator."""
    d = read_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        ((F.length(F.encode("text", "UTF-8")) % 10000) + 1000).cast("long").alias("duration_ms"),
    )
    ts = F.explode(
        F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(_FRAME_STRIDE_MS))
    )
    t = media.select("doc_id", "duration_ms", ts.alias("ts_ms"))
    return t.select(
        "doc_id", "duration_ms", "ts_ms",
        F.floor(F.col("ts_ms") * _FRAME_FPS / 1000.0).cast("long").alias("frame_idx"),
    )


# --- grouped-agg pandas UDF (§2.11 UDAF surface) -------------------------


_GINI_SQL = f"""
WITH q AS (
  SELECT event_type, CAST(FLOOR(value * {_Q_UNIT} + 0.5) AS BIGINT) AS qv
  FROM events
), ranked AS (
  SELECT event_type, qv,
         row_number() OVER (PARTITION BY event_type ORDER BY qv) AS r
  FROM q
), agg AS (
  SELECT event_type, COUNT(*) AS n, SUM(qv) AS total, SUM(r * qv) AS rank_sum
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       ROUND(CASE WHEN n = 0 OR total = 0 THEN 0.0
             ELSE CAST(2 * rank_sum AS DOUBLE) / CAST(n * total AS DOUBLE)
                  - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) END, 9) AS gini
FROM agg
"""


def gini_scalar(x) -> float:
    """Exact Gini over 1e-6-quantized values — the scalar the UDAF
    applies per group. Kept module-level so tests can hit the overflow
    guard directly. The int64 fast path is taken only when the rank-sum
    magnitude bound n^2 * max(|min|,|max|) fits; otherwise Python
    bigints keep the sum exact (matching DuckDB's HUGEINT)."""
    import numpy as np

    q = np.sort(np.floor(np.asarray(x, dtype=np.float64) * _Q_UNIT + 0.5).astype(np.int64))
    n = len(q)
    if n == 0:
        return 0.0
    # overflow guards must consider NEGATIVE values too: |total| is
    # bounded by n * max(|min|, |max|) and |rank_sum| by n^2 * that —
    # numpy int64 sums wrap silently, so route each to Python bigints
    # when its bound approaches 2^62
    maxabs = max(abs(int(q[0])), abs(int(q[-1])))
    if n * maxabs >= 2**62:
        total = sum(int(val) for val in q)
    else:
        total = int(q.sum())
    if total == 0:
        return 0.0
    if n * n * maxabs >= 2**62:
        rank_sum = sum((i + 1) * int(val) for i, val in enumerate(q))
    else:
        rank_sum = int((np.arange(1, n + 1, dtype=np.int64) * q).sum())
    return float(2 * rank_sum) / float(n * total) - float(n + 1) / float(n)


@query("gini_by_event_type", _GINI_SQL)
def gini_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of event values per type — EXACT, computed
    natively on the bucketed prefix-sum primitive (r14; formerly the
    GROUPED_AGG pandas UDAF now kept as ``gini_grouped_udaf``).

    The rank-sum Gini over 1e-6-quantized values decomposes onto the
    (event_type, qv) support: a tie block of count c whose group has
    cb strictly-smaller rows occupies ranks cb+1..cb+c, so its exact
    rank-sum contribution is qv * (c*cb + c*(c+1)/2) — tie-order
    invariant by construction, identical to the UDAF's sorted fold and
    to the oracle's arbitrary-tie row_number.  cb rides
    ranks.bucketed_cum_sum partitioned by (event_type, bucket) —
    cluster-wide parallelism instead of one Arrow batch per group
    (the r13 VERDICT finding: GROUPED_AGG ships each group's ENTIRE
    value column into one python worker — a per-task memory cliff at 5
    groups x 20 TB).  Sums run in DECIMAL(38,0) (exact like DuckDB's
    HUGEINT and the UDAF's Python bigints), cast to DOUBLE only in the
    closing scalar — the same IEEE operation shape as the oracle."""
    e = ensure_parallelism(read_table(spark, sf_dir, "events"))
    q = e.select(
        "event_type",
        F.floor(F.col("value") * _Q_UNIT + F.lit(0.5))
        .cast("long")
        .alias("qv"),
    )
    from fastetl_spark.operators.ranks import (
        bucketed_cum_sum,
        collect_bucket_totals,
        materialize_with_bounds,
        totals_to_offsets,
    )

    sup = q.groupBy("event_type", "qv").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    sup, bounds = materialize_with_bounds(sup, "qv")
    totals = collect_bucket_totals(
        sup, "qv", "c", bounds=bounds, partition_cols=["event_type"]
    )
    cum = bucketed_cum_sum(
        sup,
        "qv",
        "c",
        bounds=bounds,
        partition_cols=["event_type"],
        out_col="cb",
        offsets=totals_to_offsets(totals, len(bounds) + 1),
    )
    dec = "DECIMAL(38,0)"
    agg = (
        cum.withColumn(
            # c*(c+1)/2 without division: exactly one factor is even
            "half",
            F.expr(
                f"CASE WHEN c % 2 = 0 THEN CAST(c DIV 2 AS {dec})"
                f" * CAST(c + 1 AS {dec})"
                f" ELSE CAST(c AS {dec}) * CAST((c + 1) DIV 2 AS {dec})"
                " END"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.expr(f"CAST(qv AS {dec}) * CAST(c AS {dec})")).alias(
                "total"
            ),
            F.sum(
                F.expr(
                    f"CAST(qv AS {dec})"
                    f" * (CAST(c AS {dec}) * CAST(cb AS {dec}) + half)"
                )
            ).alias("rank_sum"),
        )
    )
    return agg.select(
        "event_type",
        F.round(
            F.when(
                (F.col("n") == 0) | (F.col("total") == 0), F.lit(0.0)
            ).otherwise(
                (F.lit(2) * F.col("rank_sum")).cast("double")
                / (F.col("n") * F.col("total")).cast("double")
                - (F.col("n") + F.lit(1)).cast("double")
                / F.col("n").cast("double")
            ),
            9,
        ).alias("gini"),
    )


def gini_grouped_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas-UDF form of ``gini_by_event_type`` — the
    custom-UDAF plugin surface demo: Arrow ships each group's column to
    Python once, the UDAF returns one scalar per group.

    MODERATE-GROUP CONTRACT: a GROUPED_AGG buffer is the whole group by
    construction (each group's entire value column lands in one Arrow
    batch in one python worker), so this form is bounded by the largest
    group's size — use the gated native decomposition above when groups
    are data-scale.  Kept equivalent by
    tests/test_llm_ops.py::test_gini_udaf_matches_native_formula."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def gini(v: pd.Series) -> float:
        return gini_scalar(v.to_numpy(dtype=np.float64))

    e = ensure_parallelism(read_table(spark, sf_dir, "events"))
    return (
        e.groupBy("event_type")
        .agg(gini("value").alias("gini"))
        .select("event_type", F.round("gini", 9).alias("gini"))
    )


def gini_native_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same Gini formula as native window expressions (rank per group,
    then one aggregate) — the verification twin for the UDAF."""
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type", "value", F.row_number().over(w).alias("r")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.sum(F.col("r") * F.col("value")).alias("rank_sum"),
        )
        .select(
            "event_type",
            (
                (F.lit(2.0) * F.col("rank_sum")) / (F.col("n") * F.col("total"))
                - (F.col("n") + F.lit(1.0)) / F.col("n")
            ).alias("gini"),
        )
    )


# --- declared-vs-detected media type screen (gated) ------------------------

_MISMATCH_SQL = r"""
WITH m AS (
  SELECT doc_id, 'image/png' AS declared,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN '\x89PNG\x0D\x0A\x1A\x0A'::BLOB || encode(text)
           WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
           WHEN 2 THEN 'GIF89a'::BLOB || encode(text)
           ELSE 'RIFF\x00\x00\x00\x00WAVE'::BLOB || encode(text)
         END AS p
  FROM documents
), h AS (
  SELECT doc_id, declared, hex(p) AS hx FROM m
)
SELECT doc_id, declared,
       CASE
         WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
         WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
         WHEN substr(hx, 1, 12) = '474946383961' THEN 'image/gif'
         WHEN substr(hx, 1, 8) = '52494646'
              AND substr(hx, 17, 8) = '57415645' THEN 'audio/wav'
         ELSE 'application/octet-stream'
       END AS detected,
       CASE
         WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
         WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
         WHEN substr(hx, 1, 12) = '474946383961' THEN 'image/gif'
         WHEN substr(hx, 1, 8) = '52494646'
              AND substr(hx, 17, 8) = '57415645' THEN 'audio/wav'
         ELSE 'application/octet-stream'
       END <> declared AS mismatch
FROM h
"""


def media_type_mismatch(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    declared_col: str = "media_type",
) -> DataFrame:
    """Declared-vs-detected media type screen: the ingest check that a
    column's claimed MIME type matches what the payload's magic bytes
    actually say — (id, declared, detected, mismatch). Mislabeled rows
    are THE classic multimodal-corpus defect (an mp3 in the image
    column crashes the decoder fleet hours later); this is the
    broadcast-free single-pass projection that catches it upstream."""
    # magic-byte tests read at most bytes 1-12 (RIFF form type ends at
    # offset 12): hex only that prefix, not the whole payload
    return media.select(
        F.col(id_col).alias("doc_id"),
        F.col(declared_col).alias("declared"),
        detect_format(F.hex(F.substring(F.col(payload_col), 1, 12))).alias(
            "detected"
        ),
    ).withColumn("mismatch", F.col("detected") != F.col("declared"))


@query("media_type_mismatch_report", _MISMATCH_SQL)
def media_type_mismatch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every payload declared 'image/png' but stamped with mixed real
    magic bytes (doc_id % 4 rotates PNG/JPEG/GIF/WAV) — the mismatch
    screen must flag exactly the 3/4 of rows whose container disagrees
    with the declaration."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    media = to_media_table(
        d.withColumn("payload", _stamped_payload()),
        "doc_id",
        "payload",
        "image/png",
    )
    return media_type_mismatch(media)


# --- PCM sample statistics (decode the data chunk, no audio lib) -----------
#
# One level deeper than header parsing: decode the ACTUAL samples. PCM
# in a WAV data chunk is bytes with public semantics — 8-bit samples
# are unsigned with a 128 offset, 16-bit samples are signed
# little-endian — so "decoding" is integer arithmetic, no codec.
# Samples interleave across channels (sample i belongs to channel
# i % n_channels), and per-(doc, channel) min/max/sum/count are exact
# BIGINTs with one IEEE division for the mean. The audio-QA screen
# (clipping, DC offset, dead channels) runs on exactly these stats.

def _wav_stats_sql(dhx: str, ds: str) -> str:
    """DuckDB per-(doc, channel) PCM sample statistics recomputed from
    the fixture SPEC (sample bytes = ``dhx`` hex, data size = ``ds``),
    parameterized so the base WAV fixture and the audio-QA fixture
    (clip markers / constant blocks appended) share one derivation."""
    return f"""
WITH m AS (
  SELECT doc_id,
         {_WAV_SR} AS sr, {_WAV_CH} AS ch, {_WAV_BITS} AS bits,
         {dhx} AS dhx,
         {ds} AS ds
  FROM documents WHERE doc_id % 17 <> 0
), idx AS (
  SELECT doc_id, ch, bits, dhx,
         unnest(generate_series(
           0, (CASE WHEN bits = 8 THEN ds
                    ELSE CAST(floor(ds / 2.0) AS BIGINT) END) - 1)) AS i
  FROM m
  WHERE (CASE WHEN bits = 8 THEN ds
              ELSE CAST(floor(ds / 2.0) AS BIGINT) END) > 0
), samp AS (
  SELECT doc_id, CAST(i % ch AS INT) AS channel,
         CASE WHEN bits = 8
              THEN ('0x' || substr(dhx, CAST(i * 2 + 1 AS INT), 2))::BIGINT
                   - 128
              ELSE ('0x' || substr(dhx, CAST(i * 4 + 1 AS INT), 2))::BIGINT
                   + 256 * ('0x' || substr(dhx, CAST(i * 4 + 3 AS INT), 2))::BIGINT
                   - (CASE WHEN ('0x' || substr(dhx, CAST(i * 4 + 3 AS INT), 2))::BIGINT
                                >= 128 THEN 65536 ELSE 0 END)
         END AS s
  FROM idx
)
SELECT doc_id, channel,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(MIN(s) AS BIGINT) AS min_s,
       CAST(MAX(s) AS BIGINT) AS max_s,
       CAST(SUM(s) AS BIGINT) AS sum_s,
       CAST(SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_s
FROM samp GROUP BY 1, 2
"""


_WAV_STATS_SQL = _wav_stats_sql(
    "hex(encode(text))", "octet_length(encode(text))"
)


def wav_sample_stats(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode PCM samples straight from WAV payloads and report exact
    per-(doc, channel) statistics: (doc_id, channel, n_samples, min_s,
    max_s, sum_s, mean_s). Header fields come from wav_header_info
    (only valid PCM payloads contribute); 8-bit samples are unsigned
    128-offset, 16-bit signed little-endian (a trailing odd byte is
    not a sample); channels deinterleave as i % n_channels. One
    header-parse projection + one explode + one map-side-combinable
    groupBy — the same exchange profile as the byte profile.

    SCALE WARNING: this is the GATEABLE twin, not the production path.
    The explode keeps the hex'd header+data string (capped at
    44 + data_bytes — trailing chunks are never hex'd) in every
    per-sample row (O(n_samples x data_len) intermediate — a 5 MB WAV
    is ~2.5M rows each dragging a 10 MB string). At real audio sizes use
    wav_sample_stats_pandas: the equality-tested Arrow twin decodes
    each payload with one numpy frombuffer pass and emits <=channels
    rows per doc — THE 100 TB plan, exactly as payload_byte_profile
    pairs with payload_byte_profile_pandas."""
    info = wav_header_info(media, id_col=id_col, payload_col=payload_col)
    src = media.select(
        F.col(id_col).alias("doc_id"),
        F.col(payload_col).alias("__pay"),
        # bytes actually PRESENT after the header: a truncated upload
        # whose header still claims the full data size must not read
        # past the payload (phantom NULL samples) — clamp to the real
        # buffer, exactly as the Arrow twin's buf[44:44+ds] slice does
        F.greatest(
            F.length(payload_col).cast("long") - 44, F.lit(0)
        ).alias("__avail"),
    ).join(
        # only PCM depths this decoder understands: 24-bit (and any
        # other depth) would be silently misread as 16-bit pairs —
        # honest no-rows instead, matching the Arrow twin
        info.filter("valid").filter(
            F.col("bits_per_sample").isin(8, 16)
            & (F.col("channels") > 0)
        ),
        "doc_id",
    )
    eff = F.least(F.col("data_bytes"), F.col("__avail"))
    n_s = F.when(F.col("bits_per_sample") == 8, eff).otherwise(
        (eff / 2).cast("long")
    )
    # hex only header + effective data chunk (the r9 nit): trailing
    # chunks/junk past 44 + data_bytes never reach the hex string —
    # the same slice the Arrow twin takes with buf[44:44+ds]
    idx = (
        src.withColumn("__ns", n_s)
        .filter(F.col("__ns") > 0)
        .withColumn(
            "__phx",
            F.hex(
                F.expr(
                    "substring(__pay, 1,"
                    " CAST(44 + least(data_bytes, __avail) AS INT))"
                )
            ),
        )
        .select(
            "doc_id",
            "channels",
            "bits_per_sample",
            "__phx",
            F.explode(F.sequence(F.lit(0), F.col("__ns") - 1)).alias("i"),
        )
    )
    # data chunk starts at byte 44 -> hex offset 88 (1-indexed substr)
    b8 = F.conv(F.expr("substring(__phx, 89 + i * 2, 2)"), 16, 10).cast("long")
    lo = F.conv(F.expr("substring(__phx, 89 + i * 4, 2)"), 16, 10).cast("long")
    hi = F.conv(F.expr("substring(__phx, 91 + i * 4, 2)"), 16, 10).cast("long")
    s16 = lo + 256 * hi - F.when(hi >= 128, F.lit(65536)).otherwise(F.lit(0))
    samp = idx.select(
        "doc_id",
        (F.col("i") % F.col("channels")).cast("int").alias("channel"),
        F.when(F.col("bits_per_sample") == 8, b8 - 128)
        .otherwise(s16)
        .alias("s"),
    )
    return samp.groupBy("doc_id", "channel").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.min("s").alias("min_s"),
        F.max("s").alias("max_s"),
        F.sum("s").alias("sum_s"),
        (F.sum("s").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_s"
        ),
    )


def _decode_pcm_payload(payload):
    """Shared numpy PCM decode core for the Arrow twins: validate the
    canonical 44-byte header from raw bytes, decode samples (8-bit
    unsigned-128 / 16-bit signed LE, trailing odd byte ignored).
    Returns (channels, bits, int64 sample array) or None for
    NULL/headerless/non-PCM/empty payloads — exactly the docs the
    gated JVM twins' filter("valid") join excludes."""
    import numpy as np

    if payload is None:
        return None
    buf = bytes(payload)
    if (
        len(buf) < 44
        or buf[0:4] != b"RIFF"
        or buf[8:12] != b"WAVE"
        or buf[12:16] != b"fmt "
        or int.from_bytes(buf[20:22], "little") != 1  # PCM
    ):
        return None
    ch = int.from_bytes(buf[22:24], "little")
    bits = int.from_bytes(buf[34:36], "little")
    ds = int.from_bytes(buf[40:44], "little")
    if ch <= 0 or bits not in (8, 16):
        # unsupported depth (e.g. 24-bit PCM) would be silently
        # misdecoded as 16-bit pairs: honest no-rows instead, matching
        # the JVM twin's bits_per_sample IN (8, 16) filter
        return None
    data = buf[44 : 44 + ds]
    if bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    else:  # 16-bit signed LE; a trailing odd byte is not a sample
        n16 = len(data) // 2
        s = np.frombuffer(data[: n16 * 2], dtype="<i2").astype(np.int64)
    if len(s) == 0:
        return None
    return ch, bits, s


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("min_s", T.LongType()),
        T.StructField("max_s", T.LongType()),
        T.StructField("sum_s", T.LongType()),
        T.StructField("mean_s", T.DoubleType()),
    ]
)


def wav_sample_stats_pandas(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """The 100 TB shape of wav_sample_stats: payload samples NEVER
    become Spark rows — each Arrow batch is decoded with one numpy
    frombuffer per payload (header validated and parsed from the raw
    bytes, 8-bit unsigned-128 / 16-bit signed little-endian, channel
    deinterleave by stride slicing) and emits at most ``channels`` rows
    per doc. Bit-identical to the JVM/gated explode twin
    (equality-tested): exact int64-safe integer stats (PCM samples are
    <= 16 bits, so any payload under ~2^46 samples cannot overflow the
    per-channel sum) and the SAME single IEEE division for the mean.
    Invalid/headerless/non-PCM payloads yield no rows, matching the
    gated twin's filter("valid") join."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_pcm_payload(payload)
                if dec is None:
                    continue
                ch, bits, s = dec
                for c in range(min(ch, len(s))):
                    sc = s[c::ch]  # sample i belongs to channel i % ch
                    tot = int(sc.sum())
                    rows.append(
                        (
                            int(did),
                            c,
                            int(len(sc)),
                            int(sc.min()),
                            int(sc.max()),
                            tot,
                            float(tot) / float(len(sc)),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_STATS_SCHEMA.fields]
            )

    return media.select(id_col, payload_col).mapInPandas(
        decode, WAV_STATS_SCHEMA
    )


@query("wav_sample_stats", _WAV_STATS_SQL)
def wav_sample_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel PCM sample statistics decoded from the synthetic WAV
    payloads (the wav_header_parse fixture): the operator parses the
    header for channels/bit depth/data size, deinterleaves and
    sign-decodes the samples, and aggregates exact integer stats; the
    oracle recomputes from the fixture spec independently, so the gate
    proves the DECODE, not a shared shortcut. (The gateable explode
    plan; wav_sample_stats_pandas is the equality-tested 100 TB
    path.) The fixture media materializes once: the synthesized header
    expression is enormous (beyond the 64 KB codegen limit) and the
    operator consumes the frame twice (header parse + sample scan)."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return wav_sample_stats(materialize(wav_fixture_media(d)))


# --- audio QA screen (clipping / DC offset / dead channels, gated) ---------
#
# The reading the sample statistics exist for: per-(doc, channel)
# defect flags, exact integers end-to-end.
#   clip      — any sample at the integer full-scale bound (127/-128 at
#               8-bit, 32767/-32768 at 16-bit): the waveform hit the
#               converter's ceiling and is distorted.
#   dc_offset — |mean| above a full-scale fraction (default 1/20): a
#               biased capture chain; as exact integers,
#               |sum| * den > n * bound * num.
#   dead      — min == max: a constant (disconnected/muted) channel.
# The QA fixture extends the WAV fixture so every flag has positive
# cases under the oracle: doc_id % 19 docs carry a CONSTANT 16-byte
# data block (dead + dc_offset), doc_id % 13 docs get a full-scale
# 0xFF7F marker appended to the text bytes — 16-bit: samples of 32767;
# 8-bit: 127s — (clip; the text itself is UTF-8, which contains no
# 0x00/0xFF byte, so unmarked docs can never clip). A '00' pad byte
# keeps the marker sample-aligned for odd-length 16-bit payloads.


def _wav_qa_data_hx(enc: str) -> str:
    """Hex of the QA fixture's data chunk (shared Spark/DuckDB
    fragment; ``enc`` = the engine's encode-to-bytes expression)."""
    return (
        "CASE WHEN doc_id % 19 = 0 THEN repeat('40', 16) "
        f"WHEN doc_id % 13 = 0 THEN concat(hex({enc}), "
        f"CASE WHEN octet_length({enc}) % 2 = 1 THEN '00' ELSE '' END, "
        "'FF7FFF7FFF7FFF7F') "
        f"ELSE hex({enc}) END"
    )


def _wav_qa_ds(enc: str) -> str:
    return (
        "CASE WHEN doc_id % 19 = 0 THEN 16 "
        f"WHEN doc_id % 13 = 0 THEN octet_length({enc}) + 8 "
        f"+ octet_length({enc}) % 2 "
        f"ELSE octet_length({enc}) END"
    )


def audio_qa_report(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    arrow: bool = False,
    dc_num: int = 1,
    dc_den: int = 20,
) -> DataFrame:
    """Per-(doc, channel) audio defect screen over WAV payloads:
    (doc_id, channel, n_samples, clip, dc_offset, dead). Flags are
    pure integer predicates over the exact sample statistics (see
    module comment); the full-scale bound comes from the PARSED bit
    depth, and a 1-sample channel is constant by definition (dead
    flags it; filter on n_samples if that reading is unwanted).

    ``arrow=True`` routes to wav_audio_qa_pandas — header validation,
    decode, stats and flags in ONE mapInPandas pass (no per-sample
    rows, no stats/header join): the 100 TB plan, equality-tested
    against this gateable JVM form."""
    if arrow:
        return wav_audio_qa_pandas(
            media, id_col=id_col, payload_col=payload_col,
            dc_num=dc_num, dc_den=dc_den,
        )
    stats = wav_sample_stats(media, id_col=id_col, payload_col=payload_col)
    bits = (
        wav_header_info(media, id_col=id_col, payload_col=payload_col)
        .filter("valid")
        .select("doc_id", "bits_per_sample")
    )
    hi = F.when(F.col("bits_per_sample") == 8, F.lit(127)).otherwise(
        F.lit(32767)
    )
    lo = -hi - 1
    return stats.join(bits, "doc_id").select(
        "doc_id",
        "channel",
        "n_samples",
        ((F.col("max_s") >= hi) | (F.col("min_s") <= lo)).alias("clip"),
        (
            F.abs(F.col("sum_s")) * F.lit(dc_den)
            > F.col("n_samples") * hi * F.lit(dc_num)
        ).alias("dc_offset"),
        (F.col("min_s") == F.col("max_s")).alias("dead"),
    )


_WAV_QA_SQL = f"""
WITH stats AS (
{_wav_stats_sql(_wav_qa_data_hx("encode(text)"), _wav_qa_ds("encode(text)"))}
)
SELECT doc_id, channel, n_samples,
       (max_s >= hi OR min_s <= -hi - 1) AS clip,
       (abs(sum_s) * 2 > n_samples * hi * 1) AS dc_offset,
       (min_s = max_s) AS dead
FROM (
  SELECT s.*,
         CASE WHEN doc_id % 3 = 0 THEN 127 ELSE 32767 END AS hi
  FROM stats s
)
"""


@query("wav_audio_qa", _WAV_QA_SQL)
def wav_audio_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio QA screen over the extended WAV fixture: the operator
    parses headers, decodes samples and derives the flags from its own
    statistics; the oracle re-derives everything from the fixture spec
    (including which docs carry the planted clip markers and constant
    blocks), so the gate proves decode AND flag logic. The gated query
    pins dc at HALF full scale (dc_den=2): text-byte "audio" is
    heavily DC-biased by construction (ASCII bytes sit far from the
    16-bit midpoint), so the production 5% default would flag every
    row — at 50% the 8-bit text docs (|mean| ~ 30 of 127) stay clean
    while 16-bit docs and the planted constant blocks trip it, giving
    every flag positive AND negative cases (%13 -> clip, %19 -> dead,
    unplanted docs never clip: UTF-8 contains no 0x00/0xFF byte)."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    enc = "encode(text, 'UTF-8')"
    data_hx = _wav_qa_data_hx(enc)
    media = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 0, F.encode("text", "UTF-8")
        ).otherwise(
            F.unhex(
                F.expr(
                    f"concat({_wav_header_hex(_wav_qa_ds(enc))}, {data_hx})"
                )
            )
        ).alias("payload"),
    )
    # one fixture synthesis, three consumers (stats header parse, stats
    # sample scan, QA bits join) — without this the giant header hex
    # expression evaluates once per consumer
    return audio_qa_report(materialize(media), dc_num=1, dc_den=2)


WAV_QA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("clip", T.BooleanType()),
        T.StructField("dc_offset", T.BooleanType()),
        T.StructField("dead", T.BooleanType()),
    ]
)


def wav_audio_qa_pandas(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dc_num: int = 1,
    dc_den: int = 20,
) -> DataFrame:
    """ONE-PASS Arrow form of the audio QA screen: header validation,
    PCM decode, per-channel stats and the three defect flags all inside
    a single mapInPandas pass (numpy; <= channels rows out per doc) —
    no stats/header join, no per-sample rows. The flag predicates are
    the same exact-integer comparisons as audio_qa_report's JVM layer
    (equality-tested), so this is both the 100 TB plan AND the
    stateless shape the streaming gate feeds payload slices through."""

    def screen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_pcm_payload(payload)
                if dec is None:
                    continue
                ch, bits, s = dec
                hi = 127 if bits == 8 else 32767
                for c in range(min(ch, len(s))):
                    sc = s[c::ch]
                    mn, mx = int(sc.min()), int(sc.max())
                    tot, n = int(sc.sum()), int(len(sc))
                    rows.append(
                        (
                            int(did),
                            c,
                            n,
                            mx >= hi or mn <= -hi - 1,
                            abs(tot) * dc_den > n * hi * dc_num,
                            mn == mx,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_QA_SCHEMA.fields]
            )

    return media.select(id_col, payload_col).mapInPandas(
        screen, WAV_QA_SCHEMA
    )
