"""Generate the dataset blobs missing from the reference tree into ./data.

FashionMNIST images use the reference's REAL label streams
(``src/data/fashionmnist/*-labels-idx1-ubyte``) when mounted; CIFAR-10
batches are fully synthetic (archive was never committed,
``qbm_main.py:45`` dead code).  Formats are the real on-disk ones — see
``qbmx/data/synthesize.py``.  Usage:

    python scripts/synthesize_missing_data.py [dest=data]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qbmx.data.synthesize import (  # noqa: E402
    read_idx1,
    synthesize_cifar10,
    synthesize_fashionmnist,
)

REF_FASHION = Path("/root/reference/src/data/fashionmnist")


def main(dest="data"):
    lt = le = None
    if REF_FASHION.is_dir():
        lt = read_idx1(REF_FASHION / "train-labels-idx1-ubyte")
        le = read_idx1(REF_FASHION / "t10k-labels-idx1-ubyte")
        print(f"using reference label streams ({len(lt)} train / {len(le)} test)")
    d1 = synthesize_fashionmnist(dest, labels_train=lt, labels_test=le)
    d2 = synthesize_cifar10(dest)
    print(f"wrote {d1} and {d2}")


if __name__ == "__main__":
    main(*sys.argv[1:])
