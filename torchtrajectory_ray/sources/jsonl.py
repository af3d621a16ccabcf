"""JSONL ingestion — newline-delimited JSON pages → canonical parquet.

The interchange format scraped corpora usually arrive in: one JSON
object per line with ``url``, ``text``, optional ``lang``, optional
``warc_ts`` (ISO-8601 or epoch-µs int), optional ``html`` (base64).
One Ray task per input file (gzip transparent), atomic shard write +
sidecar checkpoint — the same resumable ingestion shape as
``sources.warc``; the ordinary ``build_index`` consumes the shards.

Missing fields degrade explicitly: absent ``html`` → derived wrapper is
NOT invented, the column is null (``prepare_table`` accepts text-only
rows); absent ``lang`` → the lang-id heuristic; absent ``warc_ts`` →
epoch 0.  Lines that don't parse follow ``bad_records`` ("raise" /
"drop")."""

from __future__ import annotations

import base64
import gzip
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _parse_ts(v) -> int:
    if v is None:
        return 0
    if isinstance(v, (int, float)):
        return int(v)
    from torchtrajectory_ray.sources.warc import _parse_warc_date

    return _parse_warc_date(str(v))


class _JsonlShardTask:
    def __init__(self, out_dir: str, bad_records: str):
        self.out_dir = out_dir
        self.bad_records = bad_records

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from torchtrajectory_ray.pipelines.textstats import LangId

        lang_of = LangId()
        rows = []
        from torchtrajectory_ray.sources.warc import shard_stem

        for path in batch["path"]:
            stem = shard_stem(path, ".jsonl")
            out = os.path.join(self.out_dir, f"pages-{stem}.parquet")
            sidecar = out + ".src.json"
            st = os.stat(path)
            src_id = [st.st_size, st.st_mtime_ns]
            if os.path.exists(out) and os.path.exists(sidecar):
                with open(sidecar) as f:
                    side = json.load(f)
                if side.get("src_id") == src_id:
                    rows.append(
                        {"input": path, "output": out, "skipped": True,
                         "n_pages": -1, "n_bad": int(side.get("n_bad", 0))}
                    )
                    continue
            data = open(path, "rb").read()
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
            urls, tss, htmls, texts, langs = [], [], [], [], []
            n_bad = 0
            for ln in data.splitlines():
                if not ln.strip():
                    continue
                try:
                    rec = json.loads(ln)
                    url, text = rec["url"], rec["text"]
                except (json.JSONDecodeError, KeyError, TypeError) as e:
                    if self.bad_records == "drop":
                        n_bad += 1
                        continue
                    raise ValueError(f"{path}: malformed JSONL line: {e}")
                urls.append(str(url))
                texts.append(str(text))
                tss.append(_parse_ts(rec.get("warc_ts")))
                htmls.append(
                    base64.b64decode(rec["html"]) if rec.get("html") else None
                )
                langs.append(rec.get("lang"))
            pred = lang_of.classify_batch(
                [t for t, g in zip(texts, langs) if g is None]
            )
            it = iter(pred)
            langs = [g if g is not None else next(it) for g in langs]
            cols = {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
            if all(h is None for h in htmls):
                # text-only corpus: emit a text-only shard (prepare_table
                # accepts it) instead of an all-null binary column
                del cols["html"]
            elif any(h is None for h in htmls):
                raise ValueError(
                    f"{path}: mixed html/no-html records in one file — "
                    "the build's extraction invariant needs all or none"
                )
            tbl = pa.table(cols)
            pq.write_table(tbl, out + ".tmp")
            os.replace(out + ".tmp", out)
            with open(sidecar + ".tmp", "w") as f:
                json.dump(
                    {"src_id": src_id, "n_pages": len(urls), "n_bad": n_bad}, f
                )
            os.replace(sidecar + ".tmp", sidecar)
            rows.append(
                {"input": path, "output": out, "skipped": False,
                 "n_pages": len(urls), "n_bad": n_bad}
            )
        return pd.DataFrame(rows)


def jsonl_to_parquet(
    jsonl_paths: list[str], out_dir: str, *, bad_records: str = "raise"
) -> list[str]:
    """Convert JSONL page files to canonical parquet shards (one task per
    file, resumable); returns the shard paths, build_index-ready."""
    import ray.data

    from torchtrajectory_ray.sources.warc import check_unique_outputs

    check_unique_outputs(list(jsonl_paths), ".jsonl")
    os.makedirs(out_dir, exist_ok=True)
    res = (
        ray.data.from_pandas(pd.DataFrame({"path": sorted(jsonl_paths)}))
        .repartition(len(jsonl_paths))
        .map_batches(
            _JsonlShardTask(out_dir, bad_records),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    return sorted(res["output"].tolist())
