"""Deterministic synthetic Common-Crawl-style pages corpus.

The graft of the reference's LMDB dataset generator
(`/root/reference/ocr/tools/generator.py:43-97`): builds the `pages` table
(schema per BASELINE.json input_hint) with seeded randomness (seed=4420,
echoing `ocr/config.yml:9`), zipf-distributed hosts for domain skew, and
template pages whose boilerplate (nav/header/aside/footer/script/style)
surrounds known body text.  Each noise knob probes one contract rule
(FIXTURES.md §A): comments, \r\n endings, blank-line runs, duplicate
consecutive paragraphs (CTC-collapse analog), entities, tag soup, latin-1 and
BOM encodings, plus eight fixed edge-case rows.

The `text` column is filled by the pure-Python oracle — it is the golden the
Spark engine must reproduce byte-identically.
"""

from __future__ import annotations

import datetime as dt
import random
from collections.abc import Iterator

from lightly_ocr_spark.oracle import oracle_extract

SEED = 4420
N_HOSTS = 50
ZIPF_A = 1.3
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

LANGS = ["en", "fr", "es", "de", "zh"]

WORDS = {
    "en": ("the quick brown fox jumps over a lazy dog while tables scan rows and "
           "columns merge under bright skies near quiet rivers every single day "
           "with careful hands holding small stones beside ancient walls").split(),
    "fr": ("le renard brun saute par dessus un chien très paresseux près des "
           "rivières calmes chaque journée élégante avec des pierres anciennes "
           "été déjà voilà français garçon cœur").split(),
    "es": ("el zorro marrón salta sobre un perro perezoso cerca de ríos "
           "tranquilos cada día señora niño años corazón música rápido "
           "montaña pequeño").split(),
    "de": ("der braune Fuchs springt über einen faulen Hund während Tabellen "
           "Zeilen prüfen und Spalten zusammenführen größer schön Straße "
           "über müde Bäume Käse").split(),
    "zh": "数据 表格 查询 引擎 快速 扫描 合并 排序 分区 集群 网页 提取 正文 内容 链接 密度 分块 文本".split(),
}

NAV_ITEMS = ["Home", "News", "Sports", "Tech", "About", "Contact", "Archive",
             "Login", "Help", "Privacy", "Terms", "Sitemap"]

ENTITIES = ["&amp;", "&quot;", "&#8212;", "&nbsp;", "&lt;", "&eacute;"]


def _host_weights() -> list[float]:
    return [1.0 / (k + 1) ** ZIPF_A for k in range(N_HOSTS)]


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    ws = WORDS[lang]
    toks = [rng.choice(ws) for _ in range(n)]
    if lang != "zh":
        toks[0] = toks[0][:1].upper() + toks[0][1:]
    sep = "" if lang == "zh" else " "
    return sep.join(toks) + ("。" if lang == "zh" else ".")


def _paragraph(rng: random.Random, lang: str) -> str:
    n_sent = rng.randint(1, 4)
    parts = []
    for _ in range(n_sent):
        s = _sentence(rng, lang, rng.randint(6, 18))
        roll = rng.random()
        if roll < 0.15:
            w = s.split(" ")
            mid = len(w) // 2
            w[mid] = f"<b>{w[mid]}</b>"
            s = " ".join(w)
        elif roll < 0.25:
            s = s.replace(" ", "&nbsp;", 1) if " " in s else s
        elif roll < 0.32:
            s += " " + rng.choice(ENTITIES)
        parts.append(s)
    return " ".join(parts)


def _links_list(rng: random.Random, n: int) -> str:
    items = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>'
        for w in rng.sample(NAV_ITEMS, min(n, len(NAV_ITEMS)))
    )
    return f"<ul>{items}</ul>"


def _edge_case(i: int) -> bytes | None:
    """Fixed edge rows, one per contract rule (FIXTURES.md §A)."""
    if i == 0:
        return b""  # empty html
    if i == 1:  # all-links page: zero extractable segments (F6/link density)
        lis = "".join(f'<li><a href="/{k}">item {k} here</a></li>' for k in range(30))
        return f"<html><body><ul>{lis}</ul></body></html>".encode()
    if i == 2:  # smaller than MIN_SEG_CHARS after a dense-enough block? tiny page
        return b"<p>tiny</p>"
    if i == 3:  # non-UTF8 bytes -> latin-1 fallback path
        return b"\xff\xfe<p>caf\xe9 au lait plus nine more words to pass the density gate</p>"
    if i == 4:  # duplicate consecutive paragraphs (CTC collapse)
        p = "<p>repeat me exactly the same ten words in this line.</p>"
        return f"<html><body>{p}{p}{p}</body></html>".encode()
    if i == 5:  # whitespace-run torture
        return ("<p>   spaced \t\t out   words   glued "
                "   across \f runs with ten total words here   </p>").encode()
    if i == 6:  # EOS sentinel truncation (R8)
        return ("<p>visible part has exactly ten words before the sentinel mark"
                "\x03hidden tail that must never appear</p>").encode()
    if i == 7:  # \r\n endings + split entity + comment glue
        return (b"<html><body>\r\n<p>first half of a line with twelve words "
                b"total here &am<!--x-->p; ok</p>\r\n\r\n"
                b"<p>second paragraph also carries a dozen words to stay dense "
                b"enough</p>\r\n</body></html>")
    return None


def build_page_html(i: int, rng: random.Random, lang: str) -> bytes:
    edge = _edge_case(i)
    if edge is not None:
        return edge

    title = _sentence(rng, lang, rng.randint(3, 7)).rstrip(".。")
    paras = [_paragraph(rng, lang) for _ in range(rng.randint(2, 7))]
    if rng.random() < 0.12 and paras:  # consecutive duplicate paragraph
        k = rng.randrange(len(paras))
        paras.insert(k, paras[k])
    body_parts = []
    for p in paras:
        body_parts.append(f"<p>{p}</p>")
        if rng.random() < 0.10:
            body_parts.append("<!-- ad slot %d -->" % rng.randint(1, 99))
        if rng.random() < 0.08:
            body_parts.append("")  # blank line run
    soup = ""
    if rng.random() < 0.08:
        soup = "<p>stray < bracket and <b>unclosed markup here with nine words</p>"
    page = (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"<title>{title}</title>\n"
        "<style>body { margin: 0; } a:hover { color: #c00; }</style>\n"
        "<script>var n = 1; if (n < 2 && n > 0) { n += 3; }</script>\n"
        "</head>\n<body>\n"
        f"<nav>{_links_list(rng, rng.randint(4, 9))}</nav>\n"
        f"<header><h1>{title}</h1></header>\n"
        "<article>\n" + "\n".join(body_parts) + "\n" + soup + "\n</article>\n"
        f"<aside><h3>Related</h3>{_links_list(rng, rng.randint(3, 6))}</aside>\n"
        "<footer><p><a href=\"/about\">About</a> | <a href=\"/contact\">Contact</a>"
        " &copy; 2026 Example Corp</p></footer>\n"
        "</body>\n</html>\n"
    )
    if rng.random() < 0.15:
        page = page.replace("\n", "\r\n")
    raw: bytes
    if lang in ("fr", "es", "de") and rng.random() < 0.35:
        try:
            raw = page.encode("latin-1")
        except UnicodeEncodeError:
            raw = page.encode("utf-8")
    else:
        raw = page.encode("utf-8")
    if rng.random() < 0.06:
        raw = b"\xef\xbb\xbf" + raw
    return raw


def gen_pages(n: int, seed: int = SEED) -> Iterator[dict]:
    """Yield `pages` rows: url, warc_ts, html, text (oracle golden), lang."""
    rng = random.Random(seed)
    weights = _host_weights()
    hosts = [f"host{k:03d}.example.org" for k in range(N_HOSTS)]
    for i in range(n):
        lang = LANGS[i % len(LANGS)]
        host = rng.choices(hosts, weights=weights, k=1)[0]
        slug = rng.choice(WORDS["en"])
        html = build_page_html(i, rng, lang)
        yield {
            "url": f"https://{host}/{slug}-{i}",
            "warc_ts": EPOCH + dt.timedelta(seconds=17 * i),
            "html": html,
            "text": oracle_extract(html)["text"],
            "lang": lang,
        }


def pages_pandas(n: int, seed: int = SEED):
    """Corpus as a pandas DataFrame (input to createDataFrame / parquet)."""
    import pandas as pd

    rows = list(gen_pages(n, seed))
    return pd.DataFrame(rows)


def write_pages_parquet(
    out_dir: str, n: int, files: int = 8, seed: int = SEED
) -> int:
    """Materialize the corpus as a directory of parquet files (the batched
    KV-sink analog, `generator.py:74-87`; multi-file so the extraction job's
    file-level slices have real work units)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    per = [n // files + (1 if k < n % files else 0) for k in range(files)]
    it = gen_pages(n, seed)
    written = 0
    for k, cnt in enumerate(per):
        rows = [r for _, r in zip(range(cnt), it)]
        if not rows:
            continue
        pdf = pd.DataFrame(rows)
        pdf["warc_ts"] = (
            pd.to_datetime(pdf["warc_ts"], utc=True)
            .dt.tz_localize(None)
            .astype("datetime64[us]")  # Spark reads timestamp as µs INT64
        )
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(tbl, os.path.join(out_dir, f"part-{k:05d}.parquet"))
        written += len(rows)
    return written


def main() -> None:
    import argparse
    import json

    ap = argparse.ArgumentParser(description="write synthetic pages corpus")
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()
    rows = write_pages_parquet(args.out, args.n, args.files, args.seed)
    print(json.dumps({"rows": rows, "out": args.out, "files": args.files}))


if __name__ == "__main__":
    main()
