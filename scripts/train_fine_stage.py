"""Fine-stage training (reference scripts/train_fine_stage.py).
Thin wrapper over train_stage.py --stage fine."""

import sys

sys.argv.insert(1, "--stage")
sys.argv.insert(2, "fine")
from train_stage import main  # noqa: E402

if __name__ == "__main__":
    main()
