"""Open-vocabulary re-texting of the scaling corpora (round-9, VERDICT r8 #1).

Both superlinear scaling findings to date (dedup_ngram_jaccard α=1.195,
dedup_yield_curve α≈1.0-1.1) trace to ONE artifact of the driver's
synthetic documents table: its 31-token vocabulary SATURATES the shingle
space (27k distinct shingles for 50k docs), so every shingle's document
frequency grows with the corpus and the inverted-index self-join grows
superlinearly — which open-vocabulary crawls don't do (content-shingle
df is roughly constant in corpus size; only boilerplate df grows, and
the df cap exists precisely to drop boilerplate). This tool turns that
argument into a measurement: it rebuilds the sf0.1 and sf1 measurement
corpora with documents re-texted from a 100k-word Zipf vocabulary so
tools/scaling_curve.py can re-fit α for the shingle/n-gram entries on
realistic token statistics.

Construction (deterministic, seeded):
- every non-documents table is copied VERBATIM from its source dir, and
  documents keeps its doc_id/lang/source — so every catalog entry still
  runs, the planted-ID conventions (doc_id % k plants, the <100000
  natural-id sentinel) are untouched, and only token statistics change;
- per-doc body length = the source doc's whitespace token count, so
  total work is comparable to the driver corpus;
- body tokens are drawn iid from a 100k-word Zipf(s=1.07) vocabulary
  (inverse-CDF over the exact bounded rank distribution — numpy's
  unbounded zipf is not used);
- the first 5 tokens are one of 10 fixed BOILERPLATE phrases keyed by
  source: boilerplate shingle df ≈ n/10 grows with the corpus exactly
  like real crawl boilerplate, which is what the relative df cap
  (df > n/20) is designed to drop — the cap's effect is therefore part
  of what the re-measured exponents show;
- docs with doc_id % 20 == 7 are NEAR-DUPS of the previous doc (body
  copied, every 7th token replaced), a constant ~5% near-dup density at
  every scale, so pair-producing entries keep non-trivial yield without
  density growing in n.

The output is measurement-only (scaling exponents); the per-round
correctness gate keeps running on the driver's parquet unchanged.

Usage: python tools/make_openvocab_data.py
  [--pairs src:out ...]   default: /root/testdata/sf0.1:.scaledata/ov0.1
                          and .scaledata/sf1:.scaledata/ov1
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np

VOCAB_SIZE = 100_000
ZIPF_S = 1.07
SEED = 20260815
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
]
N_BOILERPLATE = 10
BP_LEN = 5


def zipf_cdf(v: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, v + 1, dtype=np.float64), s)
    c = np.cumsum(w)
    return c / c[-1]


def retext(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    rows = con.execute(
        f"SELECT doc_id, len(list_filter(string_split(text, ' '), "
        f"x -> x <> '')) AS n_words, lang, source "
        f"FROM '{src}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    sentinel = int(os.environ.get("SPARK_GRAFT_ID_SENTINEL", "100000"))
    assert rows and rows[-1][0] < sentinel, (
        f"doc_id sentinel violated (max {rows[-1][0]} >= {sentinel}); "
        "for deep-doc sources set SPARK_GRAFT_ID_SENTINEL to the value "
        "the source was generated with"
    )

    rng = np.random.default_rng(SEED)
    cdf = zipf_cdf(VOCAB_SIZE, ZIPF_S)
    vocab = np.array([f"w{i}" for i in range(VOCAB_SIZE)])
    boiler = [
        " ".join(f"bp{j}x{k}" for k in range(BP_LEN))
        for j in range(N_BOILERPLATE)
    ]
    # one draw for every body token of every doc, in doc_id order
    body_lens = np.array([max(r[1] - BP_LEN, 1) for r in rows])
    total = int(body_lens.sum())
    ranks = np.searchsorted(cdf, rng.random(total), side="left")
    offs = np.concatenate([[0], np.cumsum(body_lens)])

    sources = sorted({r[3] for r in rows})
    bp_of = {s: boiler[i % N_BOILERPLATE] for i, s in enumerate(sources)}

    texts: list[str] = []
    prev_body: list[str] | None = None
    for i, (doc_id, _nw, _lang, source) in enumerate(rows):
        body = list(vocab[ranks[offs[i]:offs[i + 1]]])
        if doc_id % 20 == 7 and prev_body is not None:
            body = [
                f"sub{doc_id}" if j % 7 == 3 else w
                for j, w in enumerate(prev_body)
            ]
        prev_body = body
        texts.append(bp_of[source] + " " + " ".join(body))

    import pandas as pd

    newdocs = pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": texts}
    )
    con.register("newdocs", newdocs)
    con.execute(
        f"COPY (SELECT s.doc_id, n.text, s.lang, s.source, "
        f"cast(length(n.text) AS bigint) AS n_chars "
        f"FROM '{src}/documents.parquet' s JOIN newdocs n USING (doc_id) "
        f"ORDER BY s.doc_id) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    stats = con.execute(
        f"SELECT count(*), count(DISTINCT w) FROM ("
        f"SELECT unnest(string_split(text, ' ')) AS w "
        f"FROM '{out}/documents.parquet')"
    ).fetchone()
    avg_w = con.execute(
        f"SELECT avg(len(string_split(text, ' '))) "
        f"FROM '{out}/documents.parquet'"
    ).fetchone()[0]
    print(f"{out}: docs={len(rows)} tokens={stats[0]} "
          f"distinct_tokens={stats[1]} avg_words={avg_w:.1f}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--pairs", nargs="*",
        default=[
            "/root/testdata/sf0.1:/root/repo/.scaledata/ov0.1",
            "/root/repo/.scaledata/sf1:/root/repo/.scaledata/ov1",
        ],
    )
    args = ap.parse_args()
    for pair in args.pairs:
        src, out = pair.split(":")
        retext(src, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
