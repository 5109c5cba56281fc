"""CLI: results aggregator (scripts/extract_eval.py:1-100).

Walks the eval tree, collects every run's mIoU and prints one table.
"""
from __future__ import annotations

import argparse

from wsss_tpu.eval.reports import extract_eval


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--eval_root', default='eval')
    args = p.parse_args(argv)
    rows = extract_eval(args.eval_root)
    if not rows:
        print(f'no *_iou.csv results under {args.eval_root}')
        return
    try:
        import pandas as pd
        df = pd.DataFrame(rows)
        print(df.to_string(index=False))
    except ImportError:
        for r in rows:
            print(f'{r["run"]}: {r["miou"]}')


if __name__ == '__main__':
    main()
