"""Deliberately regenerate tests/golden_values.json.

The golden tests (tests/test_golden.py) pin fixed-seed output statistics
of the SSD duality and the Haar DWT to catch unintended numerical drift.
When semantics change ON PURPOSE, run this to re-pin:

    python scripts/regen_golden.py

It deletes the stored file and re-runs the same lazy generate-and-pin
path the test module uses on first run (tests/test_golden.py:61-86), so
the regenerated values come from the identical code path the tests
exercise. Review the diff of tests/golden_values.json before committing.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    path = os.path.join(_REPO, "tests", "golden_values.json")
    if os.path.exists(path):
        os.remove(path)
        print(f"removed {path}")

    import test_golden

    test_golden.setup_module(test_golden)
    print(f"regenerated {path}:")
    for k, v in test_golden.GOLDEN.items():
        print(f"  {k}: {list(map(float, v))}")


if __name__ == "__main__":
    main()
