"""Fast bench corpus writer: synthetic pages WITHOUT the golden text column
(no oracle run), generated in parallel per output file with derived seeds —
deterministic, used only for throughput measurement."""

from __future__ import annotations

import os
import random
from multiprocessing import Pool

# bump when the generator or page templates change: the bench.py cache key
# includes it, so stale corpora are never silently reused across rounds
CORPUS_VERSION = 2

from lightly_ocr_spark.sources.synthetic import (
    EPOCH,
    LANGS,
    N_HOSTS,
    SEED,
    WORDS,
    ZIPF_A,
    build_page_html,
)


def _write_one(args) -> int:
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir, k, start, cnt = args
    rng = random.Random(SEED + 7919 * (k + 1))
    weights = [1.0 / (h + 1) ** ZIPF_A for h in range(N_HOSTS)]
    hosts = [f"host{h:03d}.example.org" for h in range(N_HOSTS)]
    rows = []
    for j in range(cnt):
        i = start + j
        lang = LANGS[i % len(LANGS)]
        host = rng.choices(hosts, weights=weights, k=1)[0]
        slug = rng.choice(WORDS["en"])
        html = build_page_html(i if i >= 8 else i + 8, rng, lang)
        rows.append(
            {
                "url": f"https://{host}/{slug}-{i}",
                "warc_ts": EPOCH + dt.timedelta(seconds=17 * i),
                "html": html,
                "text": "",
                "lang": lang,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["warc_ts"] = (
        pd.to_datetime(pdf["warc_ts"], utc=True)
        .dt.tz_localize(None)
        .astype("datetime64[us]")
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(out_dir, f"part-{k:05d}.parquet"),
    )
    return cnt


def write_bench_pages(out_dir: str, n: int, files: int = 32) -> int:
    os.makedirs(out_dir, exist_ok=True)
    per = [n // files + (1 if k < n % files else 0) for k in range(files)]
    tasks = []
    start = 0
    for k, cnt in enumerate(per):
        if cnt:
            tasks.append((out_dir, k, start, cnt))
            start += cnt
    with Pool(min(len(tasks), os.cpu_count() or 8)) as p:
        done = p.map(_write_one, tasks)
    return sum(done)
