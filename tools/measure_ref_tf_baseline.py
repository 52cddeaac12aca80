#!/usr/bin/env python
"""Measure the reference's OWN TF2-CPU throughput — the north star's baseline.

BASELINE.json's target reads "≥5× TF2-CPU images/sec/chip on joint training".
Until round 3 the environment had no TensorFlow, so bench.py's vs_baseline
ratios used a JAX-CPU proxy of THIS framework's pipeline
(tools/measure_cpu_baseline.py).  TF 2.21 plus the reference checkout are now
importable, so this tool times the reference's actual code — models built by
its own ``model()`` constructors, losses and ``apply_rf`` from its
``tf_utils``, the VGG16 perceptual net from its ``vgg16.Vgg16`` — on the TF2
CPU backend:

  (default) forward: the full 4-net inference pipeline at 512x512, batch 1,
      exactly the reference's ``@tf.function inference``
      (test_real_refinement.py:86-110).
  --train: the joint deq+lin+hal training step at the reference config
      (batch 16 @ 256^2, full losses incl. VGG perceptual + TV + CRF,
      one Adam over all three nets — joint_training.py:139-186).

The official ``vgg16.npy`` is not obtainable here (zero egress); a dict with
the correct layer names/shapes and random values is synthesized for the
timing run — identical FLOPs/graph, weights irrelevant to throughput.

Copy the printed numbers into bench.py's CPU_BASELINE_IMG_S /
CPU_BASELINE_TRAIN_IMG_S.  Run once per machine; nothing here imports from
singlehdr_tpu (it measures the reference, not the rebuild).
"""

import argparse
import contextlib
import os
import sys
import tempfile
import time

import numpy as np

# The reference was written for the Keras-2 era: Keras 3 renames variable
# attributes and rejects its positional `training` args (see
# tests/test_tf_parity.py header).  Must be set before importing tensorflow.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

REF_DIR = os.environ.get("SINGLEHDR_REFERENCE_DIR", "/root/reference")

# VGG16 conv-block shapes the reference's Vgg16 loads from vgg16.npy
# (vgg16.py:73-85 builds conv1_1..conv3_3 only; each entry is
# [HWIO filter, bias]).
_VGG_SHAPES = {
    "conv1_1": (3, 64), "conv1_2": (64, 64),
    "conv2_1": (64, 128), "conv2_2": (128, 128),
    "conv3_1": (128, 256), "conv3_2": (256, 256), "conv3_3": (256, 256),
}


@contextlib.contextmanager
def _in_ref_dir():
    # linearization_net re-reads invemor.txt with a cwd-relative open inside
    # call() (linearization_net.py:219): reference forwards must run from
    # the reference directory.
    old = os.getcwd()
    os.chdir(REF_DIR)
    try:
        yield
    finally:
        os.chdir(old)


def _ref(name):
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    import importlib

    return importlib.import_module(name)


def _synth_vgg_npy(path):
    rng = np.random.RandomState(0)
    d = {
        name: [rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05,
               np.zeros(cout, np.float32)]
        for name, (cin, cout) in _VGG_SHAPES.items()
    }
    np.save(path, d, allow_pickle=True)
    return path if path.endswith(".npy") else path + ".npy"


def measure_forward(size=512, iters=3):
    import tensorflow as tf

    tf_utils = _ref("tf_utils")
    with _in_ref_dir():
        _deq = _ref("dequantization_net").model()
        _lin = _ref("linearization_net").model()
        _hal = _ref("hallucination_net").model()
        _rfn = _ref("refinement_net").model()

        THRESHOLD = 0.12

        @tf.function
        def inference(ldr):
            # test_real_refinement.py:86-110 verbatim-in-semantics
            pred_deq = _deq(ldr, training=False)
            C_pred = tf.clip_by_value(pred_deq, 0, 1)
            pred_invcrf = _lin(C_pred, training=False)
            B_pred = tf_utils.apply_rf(C_pred, pred_invcrf)
            alpha = tf.reduce_max(B_pred, axis=[3])
            alpha = tf.minimum(1.0, tf.maximum(0.0, alpha - 1.0 + THRESHOLD) / THRESHOLD)
            alpha = tf.reshape(alpha, [-1, tf.shape(B_pred)[1], tf.shape(B_pred)[2], 1])
            alpha = tf.tile(alpha, [1, 1, 1, 3])
            bgr_hal_res = _hal(B_pred, training=False)
            hal_res = tf_utils.rgb2bgr(bgr_hal_res)
            A_pred = B_pred + alpha * hal_res
            return _rfn(tf.concat([A_pred, B_pred, C_pred], -1), training=False)

        rng = np.random.RandomState(0)
        # Unique input per iteration + a host readback per iteration — the
        # same discipline bench.py's honest loop applies to the rebuild
        # (ADVICE r3: a same-input loop with one final fetch times the
        # reference under a more cache-friendly regime than the numbers it
        # is compared against).
        xs = tf.constant(rng.rand(iters + 1, size, size, 3).astype(np.float32))
        t0 = time.time()
        inference(xs[:1]).numpy()  # trace + compile + first run
        print(f"forward trace+first: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for i in range(iters):
            inference(xs[i + 1 : i + 2]).numpy()
        dt = time.time() - t0
    print(f"TF2-CPU reference forward ({size}x{size}, 4 nets): "
          f"{iters / dt:.4f} images/sec ({dt / iters:.2f} s/img)")
    return iters / dt


def measure_train(batch=16, size=256, iters=5):
    import tensorflow as tf

    tf_utils = _ref("tf_utils")
    vgg16 = _ref("vgg16")
    with tempfile.TemporaryDirectory() as td:
        npy = _synth_vgg_npy(os.path.join(td, "vgg16.npy"))
        with _in_ref_dir():
            _deq = _ref("dequantization_net").model()
            _lin = _ref("linearization_net").model()
            _hal = _ref("hallucination_net").model()
            vgg = vgg16.Vgg16(npy)
            vgg2 = vgg16.Vgg16(npy)
            opt = tf.keras.optimizers.Adam(1e-5)  # joint_training.py:20

            @tf.function
            def train_step(ldr, jpeg_img_float, clipped_hdr_t, hdr_t,
                           loss_mask, invcrf):
                # joint_training.py:139-186: deq L2 + lin (10*L2 + CRF) +
                # hal (L1 + 0.001*VGG perceptual + 0.1*TV), one Adam over
                # all three nets' variables.
                thr = 0.12
                alpha = tf.reduce_max(clipped_hdr_t, axis=[3])
                alpha = tf.minimum(1.0, tf.maximum(0.0, alpha - 1.0 + thr) / thr)
                alpha = tf.reshape(
                    alpha, [-1, tf.shape(clipped_hdr_t)[1],
                            tf.shape(clipped_hdr_t)[2], 1])
                alpha = tf.tile(alpha, [1, 1, 1, 3])
                with tf.GradientTape() as tape:
                    pred_deq = _deq(jpeg_img_float, training=True)
                    C_pred = tf.clip_by_value(pred_deq, 0, 1)
                    loss_deq = tf.multiply(
                        tf_utils.get_l2_loss_with_mask(C_pred, ldr), loss_mask)
                    pred_invcrf = _lin(ldr, training=True)
                    B_pred = tf_utils.apply_rf(ldr, pred_invcrf)
                    crf_loss = tf.reduce_mean(
                        tf.square(pred_invcrf - invcrf), axis=1, keepdims=True)
                    l2_lin = tf_utils.get_l2_loss_with_mask(B_pred, clipped_hdr_t)
                    loss_lin = tf.multiply(10.0 * l2_lin + crf_loss, loss_mask)
                    bgr_hal = _hal(clipped_hdr_t, training=True)
                    A_pred = clipped_hdr_t + alpha * tf_utils.bgr2rgb(bgr_hal)
                    lg = lambda v: tf.math.log(1.0 + 10.0 * v) / tf.math.log(11.0)
                    p1, p2, p3 = vgg(lg(A_pred))
                    q1, q2, q3 = vgg2(lg(hdr_t))
                    perc = sum(
                        tf.reduce_mean(tf.abs(a - b), axis=[1, 2, 3], keepdims=True)
                        for a, b in ((p1, q1), (p2, q2), (p3, q3)))
                    yg, hg = lg(A_pred), lg(hdr_t)
                    l1 = tf.reduce_mean(tf.abs(yg - hg), axis=[1, 2, 3], keepdims=True)
                    px = tf.pad(yg, [[0, 0], [0, 1], [0, 0], [0, 0]], "SYMMETRIC")
                    py = tf.pad(yg, [[0, 0], [0, 0], [0, 1], [0, 0]], "SYMMETRIC")
                    tv = (tf.reduce_mean(tf.abs(px[:, 1:] - px[:, :-1]))
                          + tf.reduce_mean(tf.abs(py[:, :, 1:] - py[:, :, :-1])))
                    loss_hal = tf.multiply(l1 + 0.001 * perc + 0.1 * tv, loss_mask)
                    total = loss_deq + loss_lin + loss_hal
                tvars = (_deq.trainable_variables + _lin.trainable_variables
                         + _hal.trainable_variables)
                opt.apply_gradients(zip(tape.gradient(total, tvars), tvars))
                return total

            rng = np.random.RandomState(0)
            f32 = lambda *s: tf.constant(rng.rand(*s).astype(np.float32))
            # one arg tuple per timed iteration (+1 for trace/warmup):
            # unique inputs and a per-step readback, matching bench.py's
            # loop discipline (ADVICE r3); default iters raised 2 -> 5 so
            # the published denominator is a 5-step mean, not a 2-step one.
            arg_sets = [
                (f32(batch, size, size, 3), f32(batch, size, size, 3),
                 f32(batch, size, size, 3), f32(batch, size, size, 3),
                 tf.ones([batch, 1, 1, 1]), f32(batch, 1024))
                for _ in range(iters + 1)
            ]
            t0 = time.time()
            train_step(*arg_sets[0]).numpy()
            print(f"train trace+first: {time.time() - t0:.1f}s", file=sys.stderr)
            t0 = time.time()
            for i in range(iters):
                train_step(*arg_sets[i + 1]).numpy()
            dt = time.time() - t0
    print(f"TF2-CPU reference joint train (b{batch} @ {size}^2): "
          f"{batch * iters / dt:.4f} images/sec ({dt / iters:.1f} s/step)")
    return batch * iters / dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true")
    p.add_argument("--iters", type=int, default=None)
    a = p.parse_args()
    if a.train:
        # no override -> the function's raised default (5, ADVICE r3)
        measure_train(**({"iters": a.iters} if a.iters else {}))
    else:
        measure_forward(**({"iters": a.iters} if a.iters else {}))
