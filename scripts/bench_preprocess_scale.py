"""Preprocessing at scale (VERDICT round-2 item 5): run the full raw
Ali-CCP pipeline — gen_raw -> ``convert_raw_aliccp`` (the reference's
missing preprocess_ali_ccp.py capability, reimplemented streaming) ->
``AliCCPPreprocessor`` (KBins + freq/domain filtering + the reference's
mix_interval_random 50-domain sampling, preprocess.py:253-414) — at 20M+
skeleton rows, recording wall-clock and peak RSS to replace the 2M-row
measurement + 85M projection in docs/RESULTS.md.

Usage: python scripts/bench_preprocess_scale.py [--rows 20000000]
"""

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--workdir", default="/tmp/prep_scale")
    ap.add_argument("--domains", type=int, default=50)
    ap.add_argument("--reuse", action="store_true",
                    help="skip gen_raw/convert when the split CSVs exist "
                         "(isolates the AliCCPPreprocessor stage, whose "
                         "peak RSS would otherwise be masked by the "
                         "process-wide ru_maxrss of earlier stages)")
    ap.add_argument("--gen_only", action="store_true",
                    help="stop after gen_raw + convert + split (prepare "
                         "files for isolated --reuse measurements)")
    ap.add_argument("--in_memory", action="store_true",
                    help="force the whole-DataFrame path (the pre-round-4 "
                         "behavior) for A/B against the streaming default")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from run_e2e_aliccp import gen_raw

    from tpurec.data.preprocess import AliCCPPreprocessor, convert_raw_aliccp

    if args.reuse and os.path.exists(
            os.path.join(args.workdir, "ali_ccp_test.csv")):
        train_csv = os.path.join(args.workdir, "ali_ccp_train.csv")
        val_csv = os.path.join(args.workdir, "ali_ccp_val.csv")
        test_csv = os.path.join(args.workdir, "ali_ccp_test.csv")
        t0 = time.perf_counter()
        pre = AliCCPPreprocessor(args.workdir, sample_n_domain=args.domains)
        if os.path.exists(pre.preprocess_path):
            os.unlink(pre.preprocess_path)
        pre.main(train_csv, val_csv, test_csv,
                 streaming=False if args.in_memory else None,
                 return_frame=False)
        dt = time.perf_counter() - t0
        import pandas as pd

        dom = pd.read_csv(pre.preprocess_path, usecols=["domain"])["domain"]
        mode = "in-memory" if args.in_memory else "streaming"
        print(f"AliCCPPreprocessor[{mode}]: {dt:.0f}s -> {len(dom):,} rows, "
              f"{dom.nunique()} domains "
              f"(peak RSS {rss_gb():.2f}GB)", flush=True)
        return

    t0 = time.perf_counter()
    skel, common = gen_raw(args.workdir, args.rows)
    sk_mb = os.path.getsize(skel) / 2**20
    cm_mb = os.path.getsize(common) / 2**20
    print(f"gen_raw: {args.rows/1e6:.0f}M rows in "
          f"{time.perf_counter()-t0:.0f}s (skeleton {sk_mb:.0f}MB, "
          f"common {cm_mb:.0f}MB, peak RSS {rss_gb():.2f}GB)", flush=True)

    t0 = time.perf_counter()
    train_csv = os.path.join(args.workdir, "ali_ccp_train.csv")
    val_csv = os.path.join(args.workdir, "ali_ccp_val.csv")
    convert_raw_aliccp(skel, common, train_csv, val_fraction=0.5,
                       val_out_csv=val_csv)
    dt = time.perf_counter() - t0
    print(f"convert_raw_aliccp: {dt:.0f}s "
          f"({args.rows/dt:,.0f} rows/s, peak RSS {rss_gb():.2f}GB)",
          flush=True)

    import pandas as pd

    va = pd.read_csv(val_csv)
    test_csv = os.path.join(args.workdir, "ali_ccp_test.csv")
    va.iloc[: len(va) // 2].to_csv(val_csv, index=False)
    va.iloc[len(va) // 2:].to_csv(test_csv, index=False)
    del va
    if args.gen_only:
        return

    t0 = time.perf_counter()
    pre = AliCCPPreprocessor(args.workdir, sample_n_domain=args.domains)
    df = pre.main(train_csv, val_csv, test_csv)
    dt = time.perf_counter() - t0
    print(f"AliCCPPreprocessor: {dt:.0f}s -> {len(df):,} rows, "
          f"{df['domain'].nunique()} domains "
          f"(peak RSS {rss_gb():.2f}GB)", flush=True)


if __name__ == "__main__":
    main()
