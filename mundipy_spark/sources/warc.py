"""From-scratch WARC / WET reader + writer (the Common-Crawl container
format; ISO 28500 is public). No warcio — records are parsed directly:

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of payload>\\r\\n\\r\\n

Scale notes (Common Crawl is ~100k WARC files x ~1 GB per crawl):
- files are read with Spark's `binaryFile` source, ONE FILE PER TASK,
  and parsed inside `mapInPandas` — the payload bytes never leave the
  executor that read them, and 100k files give 100k-way natural
  parallelism with zero shuffle;
- real crawl archives (`.warc.gz`) are per-record gzip MEMBERS, so a
  production reader can split files mid-archive given the sidecar
  `.warc.paths` / cdx index; that index-driven split is a planned seam
  — this reader takes whole files per task, which already matches the
  crawl's natural ~1 GB file granularity;
- parsing is bytes-in / rows-out: response records become
  (url, warc_ts, payload, rec_type); WET conversion records carry
  extracted text.

The writer exists so tests round-trip bit-exact synthetic archives
(and is the seam for emitting WET-style derived corpora).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, rec_type string, url string, warc_ts string, "
    "content_type string, payload binary"
)


def parse_warc_bytes(raw: bytes, path: str = "") -> list[dict]:
    """Parse one WARC file's bytes into record dicts. Raises on a
    malformed header block — including input that is not WARC at all
    (e.g. still-gzipped bytes: a compressed crawl file contains no
    CRLFCRLF, which previously fell through the header-terminator
    search and silently parsed to ZERO records; decompress '.warc.gz'
    before handing bytes here). Only record-boundary CRLF padding and
    a truncated FINAL record are tolerated."""
    out: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        end = raw.find(b"\r\n\r\n", pos)
        if end < 0:
            if not raw[pos : pos + 5] == b"WARC/":
                raise ValueError(
                    f"{path}: not a WARC header at byte {pos} "
                    "(gzipped or non-WARC input?)"
                )
            break  # truncated final record: tolerated
        head = raw[pos:end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"{path}: bad record header at byte {pos}")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        body_start = end + 4
        payload = raw[body_start : body_start + length]
        out.append(
            {
                "path": path,
                "rec_type": fields.get("warc-type", ""),
                "url": fields.get("warc-target-uri", ""),
                "warc_ts": fields.get("warc-date", ""),
                "content_type": fields.get("content-type", ""),
                "payload": payload,
            }
        )
        pos = body_start + length
    return out


def warc_bytes(records: list[dict]) -> bytes:
    """Serialize records (same keys parse_warc_bytes emits) to WARC/1.0
    bytes — the executor-side half of the writer, also used to build
    in-memory archives for the parser round-trip oracle."""
    parts = []
    for r in records:
        payload = r["payload"]
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('rec_type', 'response')}\r\n"
            f"WARC-Target-URI: {r.get('url', '')}\r\n"
            f"WARC-Date: {r.get('warc_ts', '')}\r\n"
            f"Content-Type: {r.get('content_type', 'application/octet-stream')}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        )
        parts.append(head.encode("utf-8"))
        parts.append(payload)
        parts.append(b"\r\n\r\n")
    return b"".join(parts)


def write_warc(records: list[dict], path: str) -> None:
    """Write records (same keys parse_warc_bytes emits) as WARC/1.0."""
    with open(path, "wb") as f:
        f.write(warc_bytes(records))


def read_warc(
    spark: SparkSession, path_glob: str, rec_types: tuple[str, ...] = ()
) -> DataFrame:
    """DataFrame over WARC records: one task per file (binaryFile
    source), records parsed executor-side in mapInPandas; optional
    record-type pushdown happens inside the parser so non-matching
    payloads are dropped before they reach a row."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    want = tuple(rec_types)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), path):
                    if want and rec["rec_type"] not in want:
                        continue
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "rec_type",
                    "url",
                    "warc_ts",
                    "content_type",
                    "payload",
                ],
            )

    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def read_wet_text(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET convenience view: conversion records with payload decoded
    as UTF-8 text — the (url, warc_ts, text) shape the pages pipeline
    ingests."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path_glob, rec_types=("conversion",))
    return recs.select(
        "url",
        F.to_timestamp(F.col("warc_ts")).alias("warc_ts"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )
