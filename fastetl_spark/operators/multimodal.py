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

    base = media.select(
        F.col(id_col).alias("doc_id"),
        F.hex(payload_col).alias("__hx"),
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
    ds = "octet_length(encode(text, 'UTF-8'))"
    media = d.select(
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
    return wav_header_info(media)


# --- image dimension parsing (PNG IHDR / GIF LSD, gated) ------------------

# The image twin of wav_header_parse: width/height straight from the
# container header, no decoder. PNG stores them BIG-endian in the IHDR
# chunk (bytes 16-23 of the file: 8-byte signature + 4-byte length +
# 'IHDR'); GIF89a stores them LITTLE-endian in the logical screen
# descriptor (bytes 6-9). The fixture synthesizes both headers with
# doc_id-derived dimensions, so the parser must handle both endianness
# conventions on real signatures.

_IMG_W = "CAST(16 + (doc_id % 1280) AS BIGINT)"
_IMG_H = "CAST(16 + ((doc_id * 7) % 720) AS BIGINT)"


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
    fragment): even doc_id -> PNG signature + IHDR with BE dims + 8-bit
    RGB fields; odd -> GIF89a + LE dims. The text payload follows as
    opaque body bytes (parsers never read past the header)."""
    png = (
        "concat('89504E470D0A1A0A', '0000000D', '49484452', "
        f"{_be_hex(_IMG_W, 4)}, {_be_hex(_IMG_H, 4)}, '0802000000')"
    )
    gif = (
        f"concat('474946383961', {_le_hex(_IMG_W, 2)}, "
        f"{_le_hex(_IMG_H, 2)}, '00')"
    )
    return f"CASE WHEN doc_id % 2 = 0 THEN {png} ELSE {gif} END"


def image_dims_info(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Parse (format, width, height) from PNG/GIF headers in a binary
    column — NULL dims for anything else. Big-endian IHDR fields for
    PNG, little-endian logical-screen fields for GIF; pure hex
    arithmetic, JVM-side."""

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
        F.hex(payload_col).alias("__hx"),
        F.length(payload_col).cast("long").alias("__n"),
    )
    is_png = (F.col("__n") >= 24) & (
        F.expr("substring(__hx, 1, 16)") == "89504E470D0A1A0A"
    ) & (F.expr("substring(__hx, 25, 8)") == "49484452")
    is_gif = (F.col("__n") >= 10) & (
        F.expr("substring(__hx, 1, 12)") == "474946383961"
    )
    return base.select(
        "doc_id",
        F.when(is_png, "image/png")
        .when(is_gif, "image/gif")
        .otherwise("unknown")
        .alias("format"),
        F.when(is_png, be(16, 4))
        .when(is_gif, le(6, 2))
        .cast("int")
        .alias("width"),
        F.when(is_png, be(20, 4))
        .when(is_gif, le(8, 2))
        .cast("int")
        .alias("height"),
    )


_IMG_SQL = f"""
WITH m AS (
  SELECT doc_id,
         unhex({_img_payload_hex()}) || encode(text) AS p
  FROM documents
), h AS (
  SELECT doc_id, hex(p) AS hx, octet_length(p) AS n FROM m
)
SELECT doc_id,
       CASE WHEN n >= 24 AND substr(hx, 1, 16) = '89504E470D0A1A0A'
                 AND substr(hx, 25, 8) = '49484452' THEN 'image/png'
            WHEN n >= 10 AND substr(hx, 1, 12) = '474946383961'
                 THEN 'image/gif'
            ELSE 'unknown' END AS format,
       CAST(CASE
         WHEN n >= 24 AND substr(hx, 1, 16) = '89504E470D0A1A0A'
              AND substr(hx, 25, 8) = '49484452' THEN
           (('0x' || substr(hx, 33, 2))::BIGINT * 256
             + ('0x' || substr(hx, 35, 2))::BIGINT) * 65536
             + ('0x' || substr(hx, 37, 2))::BIGINT * 256
             + ('0x' || substr(hx, 39, 2))::BIGINT
         WHEN n >= 10 AND substr(hx, 1, 12) = '474946383961' THEN
           ('0x' || substr(hx, 13, 2))::BIGINT
             + ('0x' || substr(hx, 15, 2))::BIGINT * 256
       END AS INT) AS width,
       CAST(CASE
         WHEN n >= 24 AND substr(hx, 1, 16) = '89504E470D0A1A0A'
              AND substr(hx, 25, 8) = '49484452' THEN
           (('0x' || substr(hx, 41, 2))::BIGINT * 256
             + ('0x' || substr(hx, 43, 2))::BIGINT) * 65536
             + ('0x' || substr(hx, 45, 2))::BIGINT * 256
             + ('0x' || substr(hx, 47, 2))::BIGINT
         WHEN n >= 10 AND substr(hx, 1, 12) = '474946383961' THEN
           ('0x' || substr(hx, 17, 2))::BIGINT
             + ('0x' || substr(hx, 19, 2))::BIGINT * 256
       END AS INT) AS height
FROM h
"""


@query("image_dims_parse", _IMG_SQL)
def image_dims_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Width/height straight from image container headers — PNG IHDR
    (big-endian) and GIF89a logical screen descriptor (little-endian)
    synthesized with doc_id-derived dimensions around the text
    payloads, parsed back JVM-side with no decoder. With
    wav_header_parse this completes the decode-free typed-metadata
    tier of the multimodal pillar."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    media = d.select(
        "doc_id",
        F.concat(
            F.unhex(F.expr(_img_payload_hex())),
            F.encode("text", "UTF-8"),
        ).alias("payload"),
    )
    return image_dims_info(media)


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
    """Gini concentration of event values per type via a GROUPED_AGG
    pandas UDF — the custom-UDAF surface: Arrow ships each group's
    column to Python once, the UDAF returns one scalar per group.
    Promoted to an EXACT oracle: rank-sum and total are exact integer
    sums over 1e-6-quantized values (ties between equal quantized
    values contribute a rank-invariant sum, so the arbitrary tie order
    cannot change the result), and the closing scalar runs the same
    IEEE operation shape as the DuckDB window re-derivation."""
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
    return media.select(
        F.col(id_col).alias("doc_id"),
        F.col(declared_col).alias("declared"),
        detect_format(F.hex(payload_col)).alias("detected"),
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

_WAV_STATS_SQL = f"""
WITH m AS (
  SELECT doc_id,
         {_WAV_SR} AS sr, {_WAV_CH} AS ch, {_WAV_BITS} AS bits,
         hex(encode(text)) AS dhx,
         octet_length(encode(text)) AS ds
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
    groupBy — the same exchange profile as the byte profile."""
    info = wav_header_info(media, id_col=id_col, payload_col=payload_col)
    src = media.select(
        F.col(id_col).alias("doc_id"), F.hex(payload_col).alias("__phx")
    ).join(info.filter("valid"), "doc_id")
    n_s = F.when(
        F.col("bits_per_sample") == 8, F.col("data_bytes")
    ).otherwise(F.expr("data_bytes div 2"))
    idx = src.withColumn("__ns", n_s).filter(F.col("__ns") > 0).select(
        "doc_id",
        "channels",
        "bits_per_sample",
        "__phx",
        F.explode(F.sequence(F.lit(0), F.col("__ns") - 1)).alias("i"),
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


@query("wav_sample_stats", _WAV_STATS_SQL)
def wav_sample_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel PCM sample statistics decoded from the synthetic WAV
    payloads (the wav_header_parse fixture): the operator parses the
    header for channels/bit depth/data size, deinterleaves and
    sign-decodes the samples, and aggregates exact integer stats; the
    oracle recomputes from the fixture spec independently, so the gate
    proves the DECODE, not a shared shortcut."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    ds = "octet_length(encode(text, 'UTF-8'))"
    media = d.select(
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
    return wav_sample_stats(media)
