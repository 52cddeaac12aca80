#!/usr/bin/env python
"""Dump a reference TF2 checkpoint to .npz for weight import.

Run this on a machine with TensorFlow installed (the TPU image doesn't ship
it), then feed the .npz to singlehdr_tpu.train.weight_import:

    python tools/dump_tf_checkpoint.py --ckpt checkpoints/deq/ckpt-42 \
        --out deq_weights.npz
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="TF checkpoint prefix")
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args()

    import numpy as np
    import tensorflow as tf

    reader = tf.train.load_checkpoint(args.ckpt)
    arrays = {
        k: reader.get_tensor(k) for k in reader.get_variable_to_shape_map()
    }
    np.savez_compressed(args.out, **arrays)
    print(f"dumped {len(arrays)} tensors to {args.out}")


if __name__ == "__main__":
    main()
