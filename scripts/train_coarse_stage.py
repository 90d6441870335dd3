"""Coarse-stage training (reference scripts/train_coarse_stage.py).
Thin wrapper over train_stage.py --stage coarse."""

import sys

sys.argv.insert(1, "--stage")
sys.argv.insert(2, "coarse")
from train_stage import main  # noqa: E402

if __name__ == "__main__":
    main()
