"""WARC ingestion — Common Crawl's native archive format → the engine's
canonical pages parquet.

A minimal, dependency-free WARC/1.0 reader (the public ISO 28500 record
framing): records are a CRLF-terminated header block, ``Content-Length``
octets of payload, and a blank-line separator.  ``response`` records
carry an HTTP message (the page body follows the first blank line);
``resource`` / ``conversion`` records carry the body directly.
Per-record gzip (the Common Crawl layout) is handled by stdlib
``gzip`` — Python's decompressor consumes multi-member streams.

``warc_to_parquet`` is the ingestion stage: ONE Ray task per WARC file
(the natural ~1 GB work unit), each writing one canonical parquet shard
atomically with a sidecar checkpoint, so a crashed ingest resumes by
skipping finished shards — after which the ordinary ``build_index``
consumes the shards unchanged.  ``text`` is derived by the SAME
``extract_text`` the build verifies against, so the byte-identity
invariant holds trivially; ``lang`` uses the corpus lang-id heuristic.
"""

from __future__ import annotations

import gzip
import os
from datetime import datetime, timezone

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_CRLF2 = b"\r\n\r\n"


def _parse_warc_date(s: str) -> int:
    """ISO-8601 WARC-Date → microseconds since epoch.  Timezone-less
    timestamps are UTC (never the ingest host's local zone — the same
    file must produce the same warc_ts on every machine)."""
    dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.astimezone(timezone.utc).timestamp() * 1_000_000)


def shard_stem(path: str, suffix: str) -> str:
    """Output stem for one input file."""
    return os.path.splitext(os.path.basename(path).replace(suffix, ""))[0]


def check_unique_outputs(paths: list[str], suffix: str) -> None:
    """Two inputs mapping to one output shard would silently overwrite
    each other (last atomic replace wins) — the same loud-uniqueness
    rule the build applies to its input basenames."""
    stems = [shard_stem(p, suffix) for p in paths]
    dups = sorted({x for x in stems if stems.count(x) > 1})
    if dups:
        raise ValueError(
            f"input files must map to unique shard names; duplicates: {dups} "
            "(rename the inputs — shards are named by basename stem)"
        )


def parse_warc(
    raw: bytes, *, bad_records: str = "raise", stats: dict | None = None
) -> list[dict]:
    """Parse one WARC file's bytes → [{url, warc_ts, html}] from its
    ``response`` / ``resource`` / ``conversion`` records (request /
    metadata / warcinfo records are skipped — they describe the crawl,
    not the pages).  ``bad_records``: "raise" (default) or "drop"
    (count-and-skip, the reference's malformed-row policy): a malformed
    record is counted in ``stats['n_bad']`` and the parser RESYNCS to
    the next ``WARC/`` header line, so one corrupt record never discards
    the rest of the file."""

    def _bad(pos: int) -> int:
        """Count one bad record and return the resync offset (next
        header line), or -1 when no further record exists."""
        if stats is not None:
            stats["n_bad"] = stats.get("n_bad", 0) + 1
        nxt = raw.find(b"\r\nWARC/", pos)
        return nxt + 2 if nxt >= 0 else -1

    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)  # multi-member streams supported
    out: list[dict] = []
    pos = 0
    n = len(raw)
    while 0 <= pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = raw.find(_CRLF2, pos)
        if head_end < 0:
            if bad_records == "drop":
                pos = _bad(pos + 1)
                continue
            raise ValueError("truncated WARC header block")
        head = raw[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            if bad_records == "drop":
                pos = _bad(pos + 1)
                continue
            raise ValueError(f"not a WARC record at offset {pos}")
        hdr = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdr[k.strip().lower()] = v.strip()
        try:
            clen = int(hdr["content-length"])
        except (KeyError, ValueError):
            if bad_records == "drop":
                pos = _bad(pos + 1)
                continue
            raise ValueError("WARC record without a valid Content-Length")
        body_start = head_end + 4
        body = raw[body_start : body_start + clen]
        if len(body) != clen:
            if bad_records == "drop":
                pos = _bad(body_start)
                continue
            raise ValueError("truncated WARC record payload")
        pos = body_start + clen
        rtype = hdr.get("warc-type", "")
        if rtype in ("response", "resource", "conversion"):
            uri = hdr.get("warc-target-uri")
            date = hdr.get("warc-date")
            if not uri or not date:
                if bad_records == "drop":
                    if stats is not None:
                        stats["n_bad"] = stats.get("n_bad", 0) + 1
                    continue
                raise ValueError(f"{rtype} record missing URI/Date")
            if rtype == "response":
                # HTTP message: body follows the first blank line
                sep = body.find(_CRLF2)
                html = body[sep + 4 :] if sep >= 0 else b""
            else:
                html = body
            out.append(
                {
                    "url": uri,
                    "warc_ts": _parse_warc_date(date),
                    "html": html,
                }
            )
    return out


class _WarcShardTask:
    """One WARC file → one canonical pages parquet (atomic + sidecar
    checkpoint; a rerun skips finished shards)."""

    def __init__(self, out_dir: str, bad_records: str):
        self.out_dir = out_dir
        self.bad_records = bad_records

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from torchtrajectory_ray.functions.text import extract_text
        from torchtrajectory_ray.pipelines.textstats import LangId

        lang_of = LangId()
        rows = []
        for path in batch["path"]:
            stem = shard_stem(path, ".warc")
            out = os.path.join(self.out_dir, f"pages-{stem}.parquet")
            sidecar = out + ".src.json"
            st = os.stat(path)
            src_id = [st.st_size, st.st_mtime_ns]
            if os.path.exists(out) and os.path.exists(sidecar):
                import json

                with open(sidecar) as f:
                    side = json.load(f)
                if side.get("src_id") == src_id:
                    rows.append(
                        {"input": path, "output": out, "skipped": True,
                         "n_pages": -1,
                         "n_bad": int(side.get("n_bad", 0))}
                    )
                    continue
            pstats: dict = {}
            with open(path, "rb") as f:
                recs = parse_warc(
                    f.read(), bad_records=self.bad_records, stats=pstats
                )
            n_bad = int(pstats.get("n_bad", 0))
            texts = [extract_text(r["html"]) for r in recs]
            tbl = pa.table(
                {
                    "url": pa.array([r["url"] for r in recs], pa.string()),
                    "warc_ts": pa.array(
                        [r["warc_ts"] for r in recs], pa.timestamp("us")
                    ),
                    "html": pa.array([r["html"] for r in recs], pa.binary()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(
                        lang_of.classify_batch(texts), pa.string()
                    ),
                }
            )
            pq.write_table(tbl, out + ".tmp")
            os.replace(out + ".tmp", out)
            import json

            with open(sidecar + ".tmp", "w") as f:
                json.dump(
                    {"src_id": src_id, "n_pages": len(recs), "n_bad": n_bad}, f
                )
            os.replace(sidecar + ".tmp", sidecar)
            rows.append(
                {"input": path, "output": out, "skipped": False,
                 "n_pages": len(recs), "n_bad": n_bad}
            )
        return pd.DataFrame(rows)


def warc_to_parquet(
    warc_paths: list[str], out_dir: str, *, bad_records: str = "raise"
) -> list[str]:
    """Convert WARC files to canonical pages parquet shards (one task
    per file, resumable); returns the shard paths, build_index-ready."""
    import ray.data

    check_unique_outputs(list(warc_paths), ".warc")
    os.makedirs(out_dir, exist_ok=True)
    res = (
        ray.data.from_pandas(pd.DataFrame({"path": sorted(warc_paths)}))
        .repartition(len(warc_paths))
        .map_batches(
            _WarcShardTask(out_dir, bad_records),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    return sorted(res["output"].tolist())
