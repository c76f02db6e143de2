"""Amazon preprocessing at scale (VERDICT r3 item 5): generate a
multi-GB synthetic RAW Amazon input pair — headerless ratings CSV
(itemid,userid,rating,timestamp — preprocess.py:126 schema) plus a
metadata JSON-lines file (asin/price/rank/brand/category —
preprocess.py:139-166 fields) — and run `AmazonPreprocessor` end-to-end
(12-month window filter -> k-core -> streaming meta join ->
price/rank/brand/domain feature build -> log2 binning -> encode),
recording per-stage wall-clock and peak RSS like the Ali-CCP table in
docs/RESULTS.md.

Usage: python scripts/bench_amazon_scale.py [--rows 60000000]
       [--items 3000000] [--users 8000000]
"""

import argparse
import json
import os
import resource
import sys
import time
from datetime import datetime, timedelta

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpurec.data.preprocess import AMAZON_DOMAIN2ENCODER, AmazonPreprocessor

DOMAINS = list(AMAZON_DOMAIN2ENCODER)
CHARTS = DOMAINS + ["Beauty & Personal Care", "Health & Household"]


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def _zipf_ids(rng, n_rows, vocab):
    """Power-law id draw (real interaction data is heavy-tailed)."""
    u = rng.random(n_rows)
    ids = np.floor(vocab * u ** 2.2).astype(np.int64)
    return np.minimum(ids, vocab - 1)


def gen_ratings(path, rng, n_rows, n_items, n_users, end_ts, chunk=5_000_000):
    """Headerless itemid,userid,rating,timestamp CSV; ~85% of rows inside
    the 12-month training window, the rest older (exercises the window
    filter) or newer."""
    import pandas as pd

    start_ts = end_ts - int(timedelta(days=365).total_seconds())
    with open(path, "w") as f:
        written = 0
        while written < n_rows:
            m = min(chunk, n_rows - written)
            ts = np.where(
                rng.random(m) < 0.85,
                rng.integers(start_ts, end_ts, m),
                rng.integers(start_ts - 3 * 10**7, start_ts, m),
            )
            df = pd.DataFrame({
                "itemid": [f"A{i:08d}" for i in _zipf_ids(rng, m, n_items)],
                "userid": [f"U{i:08d}" for i in _zipf_ids(rng, m, n_users)],
                "rating": rng.choice([1.0, 2.0, 3.0, 4.0, 5.0], m,
                                     p=[.05, .07, .13, .25, .5]),
                "timestamp": ts,
            })
            df.to_csv(f, index=False, header=False)
            written += m
    return path


def gen_meta(path, rng, n_items, chunk=250_000):
    """JSON-lines metadata for every item id the ratings can reference."""
    n_brand = 30000
    with open(path, "w") as f:
        for lo in range(0, n_items, chunk):
            m = min(chunk, n_items - lo)
            dom = rng.integers(0, len(DOMAINS), m)
            chart = rng.integers(0, len(CHARTS), m)
            brand = rng.integers(0, n_brand, m)
            price = np.round(rng.lognormal(2.5, 1.0, m), 2)
            rank = rng.integers(1, 3_000_000, m)
            has_price = rng.random(m) > 0.25
            has_rank = rng.random(m) > 0.2
            lines = []
            for j in range(m):
                rec = {
                    "asin": f"A{lo + j:08d}",
                    "brand": f"brand_{brand[j]}" if brand[j] else "",
                    "category": [DOMAINS[dom[j]], "sub", "subsub"],
                }
                if has_price[j]:
                    rec["price"] = f"${price[j]:.2f}"
                if has_rank[j]:
                    rec["rank"] = (f"#{rank[j]:,} in {CHARTS[chart[j]]} "
                                   "(See Top 100)")
                lines.append(json.dumps(rec))
            f.write("\n".join(lines) + "\n")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60_000_000)
    ap.add_argument("--items", type=int, default=3_000_000)
    ap.add_argument("--users", type=int, default=8_000_000)
    ap.add_argument("--workdir", default="/tmp/amazon_scale")
    ap.add_argument("--reuse", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(0)
    end_ts = int(datetime(2018, 8, 15).timestamp())

    ratings = os.path.join(args.workdir, "ratings.csv")
    meta = os.path.join(args.workdir, "meta.json")
    if not (args.reuse and os.path.exists(meta)):
        t0 = time.perf_counter()
        gen_ratings(ratings, rng, args.rows, args.items, args.users, end_ts)
        print(f"gen ratings: {args.rows/1e6:.0f}M rows, "
              f"{os.path.getsize(ratings)/2**30:.2f} GiB in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        gen_meta(meta, rng, args.items)
        print(f"gen meta: {args.items/1e6:.1f}M items, "
              f"{os.path.getsize(meta)/2**30:.2f} GiB in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)

    pre = AmazonPreprocessor(args.workdir, prepare2train_month=12)
    if os.path.exists(pre.preprocess_path):
        os.unlink(pre.preprocess_path)

    t0 = time.perf_counter()
    df = pre.load_ratings(ratings)
    print(f"load_ratings: {time.perf_counter()-t0:.0f}s -> "
          f"{len(df):,} in-window rows (peak RSS {rss_gb():.2f}GB)",
          flush=True)

    t0 = time.perf_counter()
    df = pre.merge_metadata(df, meta)
    print(f"k-core + merge_metadata: {time.perf_counter()-t0:.0f}s -> "
          f"{len(df):,} rows (peak RSS {rss_gb():.2f}GB)", flush=True)

    t0 = time.perf_counter()
    out = pre.finalize(df)
    del df
    print(f"finalize: {time.perf_counter()-t0:.0f}s -> {len(out):,} rows, "
          f"{out['domain'].nunique()} domains "
          f"(peak RSS {rss_gb():.2f}GB)", flush=True)

    t0 = time.perf_counter()
    out.to_csv(pre.preprocess_path, index=False)
    print(f"write csv: {time.perf_counter()-t0:.0f}s, "
          f"{os.path.getsize(pre.preprocess_path)/2**30:.2f} GiB "
          f"(peak RSS {rss_gb():.2f}GB)", flush=True)


if __name__ == "__main__":
    main()
