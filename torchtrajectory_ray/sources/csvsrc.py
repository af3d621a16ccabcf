"""CSV / TSV ingestion — delimited page files → canonical parquet.

The third interchange format beside WARC and JSONL: a header row names
the columns (``url`` and ``text`` required; ``lang``, ``warc_ts``,
``html_b64`` optional), delimiter comes from the extension (``.tsv`` →
tab) or the ``delimiter`` argument, gzip is transparent.  One Ray task
per input file with atomic shard write + sidecar checkpoint — the same
resumable ingestion shape as ``sources.warc`` / ``sources.jsonl``; the
ordinary ``build_index`` consumes the shards unchanged.

Missing optional fields degrade exactly like JSONL: no ``html_b64`` →
text-only shard (never an invented wrapper); empty ``lang`` → the
lang-id heuristic; empty ``warc_ts`` → epoch 0.  Malformed rows (missing
required values, undecodable base64, short rows) follow ``bad_records``
("raise" / "drop", drop counts into the sidecar)."""

from __future__ import annotations

import base64
import binascii
import csv
import gzip
import io
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_REQUIRED = ("url", "text")


def _parse_ts_str(v: str | None) -> int:
    """CSV cells are always strings: an all-digits cell is epoch-µs,
    anything else goes through the shared ISO/WARC date parser."""
    if not v:
        return 0
    s = v.strip()
    if s.lstrip("+-").isdigit():
        return int(s)
    from torchtrajectory_ray.sources.jsonl import _parse_ts

    return _parse_ts(s)


def _csv_stem(path: str) -> str:
    """Output shard stem for one input file — the suffix is derived PER
    FILE (mixed .csv/.tsv inputs are allowed), so the uniqueness check
    and the task must share this exact function."""
    from torchtrajectory_ray.sources.warc import shard_stem

    # Same suffix rule as _delim_for (endswith after stripping .gz) so
    # the shard name and the parser never disagree on the same file —
    # e.g. x.tsv.backup.csv is a CSV to both.
    stem = path[:-3] if path.endswith(".gz") else path
    suffix = ".tsv" if stem.endswith(".tsv") else ".csv"
    return shard_stem(path, suffix)


def _delim_for(path: str, delimiter: str | None) -> str:
    if delimiter is not None:
        return delimiter
    stem = path[:-3] if path.endswith(".gz") else path
    return "\t" if stem.endswith(".tsv") else ","


class _CsvShardTask:
    def __init__(self, out_dir: str, bad_records: str, delimiter: str | None):
        self.out_dir = out_dir
        self.bad_records = bad_records
        self.delimiter = delimiter

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from torchtrajectory_ray.pipelines.textstats import LangId

        # stdlib csv caps fields at 128 KiB by default; a real page's
        # base64 html routinely exceeds that, and the limit error is
        # raised by the reader itself (outside any per-row policy) —
        # lift it once per worker like WARC/JSONL, which have no cap
        csv.field_size_limit(2**31 - 1)
        lang_of = LangId()
        rows = []
        for path in batch["path"]:
            stem = _csv_stem(path)
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
            reader = csv.DictReader(
                io.StringIO(data.decode("utf-8")),
                delimiter=_delim_for(path, self.delimiter),
            )
            if reader.fieldnames is None or not set(_REQUIRED) <= set(
                reader.fieldnames
            ):
                raise ValueError(
                    f"{path}: header must name the required columns "
                    f"{_REQUIRED}; got {reader.fieldnames}"
                )
            urls, tss, htmls, texts, langs = [], [], [], [], []
            n_bad = 0
            for rec in reader:
                try:
                    url, text = rec["url"], rec["text"]
                    if url is None or text is None or not url:
                        raise ValueError("missing required url/text value")
                    html = (
                        base64.b64decode(rec["html_b64"], validate=True)
                        if rec.get("html_b64")
                        else None
                    )
                    ts = _parse_ts_str(rec.get("warc_ts"))
                except (ValueError, KeyError, binascii.Error) as e:
                    if self.bad_records == "drop":
                        n_bad += 1
                        continue
                    raise ValueError(f"{path}: malformed CSV row: {e}")
                urls.append(str(url))
                texts.append(str(text))
                tss.append(ts)
                htmls.append(html)
                langs.append(rec.get("lang") or None)
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
                del cols["html"]  # text-only corpus, like sources.jsonl
            elif any(h is None for h in htmls):
                raise ValueError(
                    f"{path}: mixed html/no-html rows in one file — "
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


def csv_to_parquet(
    csv_paths: list[str],
    out_dir: str,
    *,
    bad_records: str = "raise",
    delimiter: str | None = None,
) -> list[str]:
    """Convert CSV/TSV page files to canonical parquet shards (one task
    per file, resumable); returns the shard paths, build_index-ready."""
    import ray.data

    # per-file stems, the SAME derivation the shard task uses — a global
    # suffix would miss a.tsv.gz vs a.csv.gz colliding on pages-a.parquet
    stems = [_csv_stem(p) for p in csv_paths]
    dups = sorted({s for s in stems if stems.count(s) > 1})
    if dups:
        raise ValueError(
            f"input files must map to unique shard names; duplicates: {dups} "
            "(rename the inputs — shards are named by basename stem)"
        )
    os.makedirs(out_dir, exist_ok=True)
    res = (
        ray.data.from_pandas(pd.DataFrame({"path": sorted(csv_paths)}))
        .repartition(len(csv_paths))
        .map_batches(
            _CsvShardTask(out_dir, bad_records, delimiter),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    return sorted(res["output"].tolist())
