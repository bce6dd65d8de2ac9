"""Demo: compare the BPMulT model generations on synthetic data.

The reference ships two Colab notebooks that train BERT-only, MulT+GMU,
Translating-MMT+GMU and the GMU classifiers on a small Moviescope subset and
compare AUC-PR (ref: DEMO_BPMultimodal_Transformer.ipynb,
DEMO_GMUs_proposals…ipynb; SURVEY.md §2 C30, §6).  This script is the
equivalent executable demo: it trains each registered model family for a few
epochs on the synthetic task and prints a comparison table.

Run (CPU ok):
    JAX_PLATFORMS=cpu python examples/demo_model_comparison.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from bpx.config import get_preset
from bpx.train.loop import test, train


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--suite", default="generations", choices=["generations", "gmus"],
        help="'generations' = notebook 1's model-generation comparison; "
             "'gmus' = notebook 2's bimodal/trimodal/hier/softmax GMU "
             "side-by-side (DEMO_GMUs cells 68-77)")
    args = parser.parse_args()

    suites = {
        # bertclf first: the text-only baseline is the anchor row of both
        # notebooks' comparison tables (notebook 1 cell 63, notebook 2
        # cell 68 outputs)
        "generations": ["bertclf", "gmu", "tmmtrvpa", "mmtrvapt"],
        "gmus": ["bertclf", "gmu_bi", "gmu", "gmu_hier", "gmu_softmax"],
    }
    results = {}
    base = get_preset("synthetic-tiny")
    for name in suites[args.suite]:
        model_cfg = base.model.replace(
            model=name, use_poster=(name == "mmtrvapt"))
        exp = base.replace(
            model=model_cfg,
            train=dataclasses.replace(base.train, name=f"demo_{name}",
                                      savedir="runs/demo", max_epochs=2,
                                      gradient_accumulation_steps=2))
        print(f"=== training {name} ===")
        train(exp)
        results[name] = test(exp)

    print("\n=== comparison (synthetic task) ===")
    print(f"{'model':12s} {'auc_pr_micro':>14s} {'auc_pr_macro':>14s} "
          f"{'micro_f1':>10s}")
    for name, m in results.items():
        print(f"{name:12s} {m.get('auc_pr_micro', float('nan')):14.4f} "
              f"{m.get('auc_pr_macro', float('nan')):14.4f} "
              f"{m.get('micro_f1', float('nan')):10.4f}")


if __name__ == "__main__":
    sys.exit(main())
