"""WARC (Web ARChive, ISO 28500 — public spec) writer/reader: the
ingest format of web-crawl corpora (Common Crawl et al.), i.e. step 0
of a training-data pipeline.

Writer: one ``.warc`` file per Spark partition (real crawls shard into
~1 GB files; the partition is the shard), each document a
``resource``-type record — ``WARC/1.0`` header block, ``Content-Length``
framed payload, double CRLF terminators, exactly per spec.

Reader: ``binaryFile`` datasource (one row per .warc file) → an Arrow
``mapInPandas`` record parser → one row per record (url, date,
content_type, content).  Scale notes: a whole WARC file is held in one
task (the binaryFile contract) — size files like crawls do (~1 GB) and
executor memory bounds hold; record parsing is sequential within a
file but files parallelize across the cluster, which is exactly how
crawl processing distributes.  Corrupt records raise per-file
``ValueError`` (skippable by dropping the file row upstream), never a
job failure.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_warc", "read_warc"]

_CRLF = "\r\n"


def _record(url: str, date: str, ctype: str, payload: bytes,
            seq: int = 0) -> bytes:
    import hashlib
    import uuid

    # WARC-Record-ID is a MANDATORY named field for every record (ISO
    # 28500 §5.2) and must be globally unique PER RECORD — (URI, date)
    # alone is not (the same page captured twice in one second, or
    # retried with a different payload).  UUID5 over (target URI, date,
    # payload digest, sequence-within-file) is unique per record while
    # staying deterministic, so retried writes still produce identical
    # bytes.
    digest = hashlib.sha256(payload).hexdigest()
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{date}|{digest}|{seq}")
    head = (f"WARC/1.0{_CRLF}"
            f"WARC-Type: resource{_CRLF}"
            f"WARC-Record-ID: <urn:uuid:{rid}>{_CRLF}"
            f"WARC-Target-URI: {url}{_CRLF}"
            f"WARC-Date: {date}{_CRLF}"
            f"Content-Type: {ctype}{_CRLF}"
            f"Content-Length: {len(payload)}{_CRLF}"
            f"{_CRLF}").encode()
    return head + payload + b"\r\n\r\n"


def write_warc(df: DataFrame, path: str, url_col: str, text_col: str,
               date_col: Optional[str] = None,
               content_type: str = "text/plain") -> int:
    """Write (url, text[, date]) rows as ``.warc`` files under ``path``,
    one file per partition — returns the number of files written.
    Deterministic given the input partitioning; pair with
    ``repartition`` / ``hash_shards`` upstream for reproducible shards.

    ``path`` must be visible to every executor (shared filesystem /
    fuse mount) — tasks write with plain ``open`` on their host, the
    standard constraint for any sidecar-file writer."""
    import os

    os.makedirs(path, exist_ok=True)
    cols = [F.col(url_col).cast("string").alias("u"),
            F.col(text_col).cast("string").alias("t")]
    if date_col:
        cols.append(F.date_format(F.col(date_col),
                                  "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("d"))
    else:
        cols.append(F.lit("2024-01-01T00:00:00Z").alias("d"))
    skinny = df.select(*cols)

    def write_part(pid: int, rows):
        import os as _os

        buf = bytearray()
        n = 0
        for r in rows:
            # (partition id << 32) | record index: globally unique and
            # deterministic under a fixed input partitioning, so even
            # byte-identical rows in different files get distinct IDs
            buf += _record(r["u"], r["d"], content_type,
                           (r["t"] or "").encode(),
                           seq=(pid << 32) | n)
            n += 1
        if n:
            # executors create the dir themselves: the driver-side
            # makedirs above only covers local mode / shared mounts
            _os.makedirs(path, exist_ok=True)
            with open(_os.path.join(path, f"part-{pid:05d}.warc"),
                      "wb") as f:
                f.write(bytes(buf))
        yield n

    counts = skinny.rdd.mapPartitionsWithIndex(write_part).collect()
    return sum(1 for c in counts if c)


WARC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content", T.StringType()),
])


def parse_warc_bytes(blob: bytes):
    """Yield (url, date, content_type, payload bytes) per record."""
    pos = 0
    n = len(blob)
    while pos < n:
        while pos < n and blob[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        end_head = blob.find(b"\r\n\r\n", pos)
        if end_head < 0:
            raise ValueError("WARC: unterminated header block")
        head = blob[pos:end_head].decode("utf-8", "replace")
        lines = head.split(_CRLF)
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {lines[0]!r}")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC: missing/invalid Content-Length")
        body_start = end_head + 4
        payload = blob[body_start:body_start + clen]
        if len(payload) < clen:
            raise ValueError("WARC: truncated record payload")
        yield (fields.get("warc-target-uri", ""),
               fields.get("warc-date", ""),
               fields.get("content-type", ""), payload)
        pos = body_start + clen


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record across every ``.warc`` file under
    ``path`` — files parallelize across the cluster, records parse
    inside one Arrow stage."""
    files = spark.read.format("binaryFile").load(f"{path}/*.warc") \
        .select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for url, date, ctype, payload in parse_warc_bytes(
                        bytes(blob)):
                    rows.append((url, date, ctype,
                                 payload.decode("utf-8", "replace")))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              WARC_SCHEMA.fields])

    return files.mapInPandas(parse, schema=WARC_SCHEMA)
