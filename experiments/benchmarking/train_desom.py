"""Thin wrapper preserving the reference's per-model entry layout
(reference experiments/benchmarking/train_desom.py); all logic lives in the
shared harness train.py."""
import sys
from train import main  # noqa: F401  (same-directory import)

if __name__ == "__main__":
    main()
