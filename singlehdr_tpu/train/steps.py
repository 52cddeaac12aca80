"""Jittable train steps reproducing the reference drivers' objectives.

Loss weightings per driver (SURVEY.md §3):

  pretrain deq   (train.py:164-177):  sum_b mask * mean (clip(deq(jpeg)) - ldr)^2
  pretrain lin   (train.py:182-197):  sum_b mask * (l2 + 0.1 * crf_mse)
  pretrain hal   (train.py:202-244):  sum_b mask * (l1_mu + 1e-3 perc + 0.1 tv)
  joint          (joint_training.py:137-186): deq + (10*l2_lin + crf_mse) + hal,
                 ONE Adam(1e-5) over all three nets' params
  finetune       (finetune_real_dataset.py:144-178): elementwise
                 |mu(renorm(ref_out)) - mu(hdr)| summed, ONE Adam(1e-5) over all
                 four nets

Reduction semantics: TF's tape.gradient on a non-scalar target differentiates
its SUM; losses here are reduced the same way (ops.losses).

Two deliberate divergences from reference bugs, both documented in SURVEY §2:
  * the reference adds crf_loss [b,1] to l2 [b,1,1,1], silently broadcasting to
    [b,1,b,1] and cross-multiplying samples (train.py:189-191,
    joint_training.py:158-160); we pair per-sample terms as intended.
  * the finetune driver feeds an undefined name to the Hallucination-Net
    (finetune_real_dataset.py:165); we use B_pred per the inference driver.

TPU notes: every step is a single jitted, donated-state XLA program; BN stats
are threaded functionally; under a mesh the batch is sharded on 'data' (and
optionally 'spatial') and XLA inserts the gradient all-reduce automatically
because params are replicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from singlehdr_tpu.models import (
    DequantizationNet,
    HallucinationNet,
    LinearizationNet,
    RefinementNet,
)
from singlehdr_tpu.ops.color import bgr_to_rgb
from singlehdr_tpu.ops.curves import apply_rf
from singlehdr_tpu.ops.losses import (
    hallucination_loss,
    masked_l2,
    scalar_from_per_sample,
)
from singlehdr_tpu.ops.masks import highlight_alpha
from singlehdr_tpu.ops.tonemap import mu_tonemap
from singlehdr_tpu.train.state import NetState

VggApply = Callable[[jnp.ndarray], Tuple[jnp.ndarray, ...]]


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Weights that differ between pretrain and joint configs."""

    crf: float = 0.1           # 0.1 pretrain (train.py:191), 1.0 joint
    lin_l2: float = 1.0        # 1.0 pretrain, 10.0 joint (joint_training.py:160)
    perceptual: float = 0.001
    tv: float = 0.1


PRETRAIN_WEIGHTS = LossWeights()
JOINT_WEIGHTS = LossWeights(crf=1.0, lin_l2=10.0)


class StepOutput(NamedTuple):
    state: NetState
    loss: jnp.ndarray
    aux: dict


def _apply(module, state: NetState, x, *, name=None, train=True, remat=False):
    """Run a module in train mode collecting new batch stats.

    With ``remat=True`` the forward is rematerialized in the backward pass
    (jax.checkpoint) — activations are recomputed instead of stored, trading
    ~1.3x FLOPs for the memory to fit larger batches/resolutions in HBM.
    Measured at the reference config (b16 @ 256^2) this is a 23% throughput
    LOSS (BENCH_NOTES round-4): the recompute itself re-reads/re-writes more
    bytes than the stored activations it avoids — it exists to fit memory,
    not to go faster.

    ``remat='convs'`` is the surgical variant: conv/matmul outputs are SAVED
    (they carry the FLOPs and are re-read by the backward anyway) while the
    cheap elementwise chains between them — BatchNorm normalize, leaky/ReLU,
    residual adds — recompute from the saved conv outputs instead of storing
    their own copies.  This targets the BN byte inflation named in the
    roofline analysis without re-running any convolution.
    """
    params = state.params if name is None else state.params[name]
    stats = state.batch_stats if name is None else state.batch_stats.get(name, {})
    if train:
        def fwd(p, inp):
            return module.apply(
                {"params": p, "batch_stats": stats},
                inp,
                train=True,
                mutable=["batch_stats"],
            )

        if remat == "convs":
            def _save_matmuls(prim, *_, **__):
                return prim.name in ("conv_general_dilated", "dot_general")

            fwd = jax.checkpoint(fwd, policy=_save_matmuls)
        elif remat:
            fwd = jax.checkpoint(fwd)
        out, mutated = fwd(params, x)
        return out, mutated["batch_stats"]
    return module.apply({"params": params, "batch_stats": stats}, x), stats


# --------------------------------------------------------------------------
# per-net pretraining steps
# --------------------------------------------------------------------------


def make_deq_train_step(dtype=jnp.float32):
    """Dequantization pretraining (train.py:164-177)."""
    net = DequantizationNet(dtype=dtype)

    @partial(jax.jit, donate_argnums=0)
    def deq_train_step(state: NetState, ldr, jpeg, mask) -> StepOutput:
        def loss_fn(params):
            pred, new_stats = _apply(net, state.replace(params=params), jpeg)
            pred = jnp.clip(pred, 0.0, 1.0)
            per_sample = masked_l2(pred, ldr, mask)
            return scalar_from_per_sample(per_sample), (new_stats, per_sample)

        (loss, (new_stats, per_sample)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return StepOutput(
            state.apply_gradients(grads, new_stats), loss, {"loss_deq": per_sample}
        )

    return deq_train_step


def make_lin_train_step(dtype=jnp.float32):
    """Linearization pretraining (train.py:182-197)."""
    net = LinearizationNet(dtype=dtype)

    @partial(jax.jit, donate_argnums=0)
    def lin_train_step(state: NetState, ldr, clipped_hdr_t, mask, invcrf_gt) -> StepOutput:
        def loss_fn(params):
            pred_invcrf, new_stats = _apply(net, state.replace(params=params), ldr)
            pred_lin = apply_rf(ldr, pred_invcrf)
            crf_mse = jnp.mean(
                jnp.square(pred_invcrf - invcrf_gt), axis=1
            ).reshape(-1, 1, 1, 1)
            per_sample = (
                masked_l2(pred_lin, clipped_hdr_t) + PRETRAIN_WEIGHTS.crf * crf_mse
            ) * mask
            return scalar_from_per_sample(per_sample), (new_stats, per_sample, crf_mse)

        (loss, (new_stats, per_sample, crf_mse)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return StepOutput(
            state.apply_gradients(grads, new_stats),
            loss,
            {"loss_lin": per_sample, "crf_mse": jnp.mean(crf_mse)},
        )

    return lin_train_step


def make_hal_train_step(vgg_apply: VggApply, dtype=jnp.float32):
    """Hallucination pretraining (train.py:202-244); VGG weights are closed
    over as jit-time constants."""
    net = HallucinationNet(dtype=dtype)

    @partial(jax.jit, donate_argnums=0)
    def hal_train_step(state: NetState, hdr_t, clipped_hdr_t, mask) -> StepOutput:
        alpha = highlight_alpha(clipped_hdr_t)

        def loss_fn(params):
            bgr_res, new_stats = _apply(
                net, state.replace(params=params), clipped_hdr_t
            )
            y = clipped_hdr_t + alpha * bgr_to_rgb(bgr_res)
            per_sample = hallucination_loss(
                y,
                hdr_t,
                vgg_apply,
                mask,
                perceptual_weight=PRETRAIN_WEIGHTS.perceptual,
                tv_weight=PRETRAIN_WEIGHTS.tv,
            )
            return scalar_from_per_sample(per_sample), (new_stats, per_sample, y)

        (loss, (new_stats, per_sample, y)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return StepOutput(
            state.apply_gradients(grads, new_stats),
            loss,
            {"loss_hal": per_sample, "y_final": y},
        )

    return hal_train_step


# --------------------------------------------------------------------------
# joint training step (deq + lin + hal, one optimizer)
# --------------------------------------------------------------------------


def make_joint_train_step(vgg_apply: VggApply, dtype=jnp.float32, remat=False):
    """Joint deq+lin+hal training (joint_training.py:137-194)."""

    deq = DequantizationNet(dtype=dtype)
    lin = LinearizationNet(dtype=dtype)
    hal = HallucinationNet(dtype=dtype)

    @partial(jax.jit, donate_argnums=0)
    def joint_train_step(
        state: NetState, ldr, jpeg, clipped_hdr_t, hdr_t, mask, invcrf_gt
    ) -> StepOutput:
        alpha = highlight_alpha(clipped_hdr_t)

        def loss_fn(params):
            st = state.replace(params=params)
            # dequantization
            c_pred, bs_deq = _apply(deq, st, jpeg, name="deq", remat=remat)
            c_pred = jnp.clip(c_pred, 0.0, 1.0)
            loss_deq = masked_l2(c_pred, ldr, mask)
            # linearization (10x l2 weight vs pretraining)
            pred_invcrf, bs_lin = _apply(lin, st, ldr, name="lin", remat=remat)
            b_pred = apply_rf(ldr, pred_invcrf)
            crf_mse = jnp.mean(
                jnp.square(pred_invcrf - invcrf_gt), axis=1
            ).reshape(-1, 1, 1, 1)
            loss_lin = (
                JOINT_WEIGHTS.lin_l2 * masked_l2(b_pred, clipped_hdr_t)
                + JOINT_WEIGHTS.crf * crf_mse
            ) * mask
            # hallucination
            bgr_res, bs_hal = _apply(hal, st, clipped_hdr_t, name="hal", remat=remat)
            a_pred = clipped_hdr_t + alpha * bgr_to_rgb(bgr_res)
            loss_hal = hallucination_loss(
                a_pred,
                hdr_t,
                vgg_apply,
                mask,
                perceptual_weight=JOINT_WEIGHTS.perceptual,
                tv_weight=JOINT_WEIGHTS.tv,
            )
            total = scalar_from_per_sample(loss_deq + loss_lin + loss_hal)
            aux = {
                "loss_deq": loss_deq,
                "loss_lin": loss_lin,
                "loss_hal": loss_hal,
                "crf_mse": jnp.mean(crf_mse),
                "c_pred": c_pred,
                "b_pred": b_pred,
                "a_pred": a_pred,
                "alpha": alpha,
            }
            return total, ({"deq": bs_deq, "lin": bs_lin, "hal": bs_hal}, aux)

        (loss, (new_stats, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return StepOutput(state.apply_gradients(grads, new_stats), loss, aux)

    return joint_train_step


# --------------------------------------------------------------------------
# finetune step (full pipeline + refinement on HDR-Real)
# --------------------------------------------------------------------------


def make_finetune_train_step(dtype=jnp.float32, remat=False):
    """Finetune all four nets on HDR-Real (finetune_real_dataset.py:144-183)."""

    deq, lin = DequantizationNet(dtype=dtype), LinearizationNet(dtype=dtype)
    hal, ref = HallucinationNet(dtype=dtype), RefinementNet(dtype=dtype)

    @partial(jax.jit, donate_argnums=0)
    def finetune_train_step(state: NetState, ldr, hdr) -> StepOutput:
        def loss_fn(params):
            st = state.replace(params=params)
            c_pred, bs_deq = _apply(deq, st, ldr, name="deq", remat=remat)
            c_pred = jnp.clip(c_pred, 0.0, 1.0)
            pred_invcrf, bs_lin = _apply(lin, st, c_pred, name="lin", remat=remat)
            b_pred = apply_rf(c_pred, pred_invcrf)
            alpha = highlight_alpha(b_pred)
            bgr_res, bs_hal = _apply(hal, st, b_pred, name="hal", remat=remat)
            a_pred = b_pred + alpha * bgr_to_rgb(bgr_res)
            out, bs_ref = _apply(
                ref,
                st,
                jnp.concatenate([a_pred, b_pred, c_pred], -1),
                name="ref",
                remat=remat,
            )
            # renormalize output mean to 0.5 before the log-domain L1
            out = out / (1e-6 + jnp.mean(out, axis=(1, 2, 3), keepdims=True)) * 0.5
            loss_map = jnp.abs(mu_tonemap(out) - mu_tonemap(hdr))
            total = jnp.sum(loss_map)  # TF sums non-scalar tape targets
            stats = {"deq": bs_deq, "lin": bs_lin, "hal": bs_hal, "ref": bs_ref}
            aux = {
                "loss_ref": jnp.mean(loss_map),
                "c_pred": c_pred,
                "b_pred": b_pred,
                "a_pred": a_pred,
                "out": out,
            }
            return total, (stats, aux)

        (loss, (new_stats, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return StepOutput(state.apply_gradients(grads, new_stats), loss, aux)

    return finetune_train_step


# Default f32 instances of the simple per-net steps (jitted once on use).
deq_train_step = make_deq_train_step()
lin_train_step = make_lin_train_step()
