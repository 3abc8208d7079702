"""Debug printer for .pt feature sidecars (reference investigate_embedding.py):
recursively dumps the dict structure, tensor shapes, and scalar values."""
from __future__ import annotations

import argparse

import numpy as np


def print_structure(obj, indent: int = 0) -> None:
    pad = " " * indent
    if isinstance(obj, dict):
        for key, value in obj.items():
            if isinstance(value, dict):
                print(f"{pad}{key}:")
                print_structure(value, indent + 2)
            else:
                print(f"{pad}{key}: {_describe(value)}")
    else:
        print(f"{pad}{_describe(obj)}")


def _describe(value) -> str:
    arr = np.asarray(value)
    if arr.ndim == 0:
        return f"scalar {float(arr):.6f}"
    return f"array shape={tuple(arr.shape)} dtype={arr.dtype}"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("pt_file", help="path to a <uuid>.pt sidecar")
    args = parser.parse_args(argv)

    from clip_assisted_data_labeling_tpu.store.sidecar import read_sidecar

    d = read_sidecar(args.pt_file)
    for model, feats in d.items():
        print(f"{model}:")
        if isinstance(feats, dict):
            for k, v in feats.items():
                print(f"  {k}: {_describe(v)}")
        else:
            print(f"  {_describe(feats)}")


if __name__ == "__main__":
    main()
