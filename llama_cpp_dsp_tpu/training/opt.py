"""Generic graph optimizer — capability mirror of ggml-opt.

Reference surface (ggml/include/ggml-opt.h, ggml/src/ggml-opt.cpp):
- loss types MEAN / SUM / CROSS_ENTROPY / MEAN_SQUARED_ERROR (ggml-opt.h:30)
- AdamW step with per-epoch hyperparameter callback
  (ggml_opt_step_adamw, ggml-opt.cpp:447; ggml_opt_get_default_optimizer_params)
- dataset container with shuffle + batch extraction (ggml_opt_dataset_*)
- result accumulation: loss/accuracy each with uncertainty
  (ggml_opt_result_loss / ggml_opt_result_accuracy)
- ggml_opt_epoch with a train/eval split index (ggml-opt.h:181-188)
- ggml_opt_fit one-call driver (ggml-opt.h:207-211)

The JAX design: the caller supplies `apply_fn(params, inputs) -> outputs`
(any jittable function — the analogue of the ctx_compute graph); fit/epoch
jit one fused value_and_grad + optax-AdamW step and one eval step. No
backward-graph construction is needed — jax.grad is the autodiff.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np


class LossType(enum.Enum):
    """ggml_opt_loss_type (ggml-opt.h:30-36)."""

    MEAN = 0
    SUM = 1
    CROSS_ENTROPY = 2
    MEAN_SQUARED_ERROR = 3


@dataclass
class AdamWParams:
    """ggml_opt_optimizer_params.adamw (ggml-opt.h:70-78); defaults match
    ggml_opt_get_default_optimizer_params."""

    alpha: float = 1e-3  # learning rate
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    wd: float = 0.0  # decoupled weight decay


@dataclass
class Dataset:
    """ggml_opt_dataset: flat [ndata, ne_datapoint] inputs + [ndata, ne_label]
    labels. Labels may be class indices (int) or full distributions/targets
    (float rows) — CE accepts both (reference datasets are one-hot rows)."""

    data: np.ndarray
    labels: np.ndarray | None = None

    def __post_init__(self):
        self.data = np.asarray(self.data)
        if self.labels is not None:
            self.labels = np.asarray(self.labels)
            assert len(self.labels) == len(self.data)

    @property
    def ndata(self) -> int:
        return len(self.data)

    def shuffle(self, rng: np.random.Generator, idata_split: int | None = None):
        """ggml_opt_dataset_shuffle: permute only [0, idata_split) so the
        validation tail stays fixed across epochs."""
        n = self.ndata if idata_split is None else idata_split
        perm = np.concatenate([rng.permutation(n), np.arange(n, self.ndata)])
        self.data = self.data[perm]
        if self.labels is not None:
            self.labels = self.labels[perm]

    def get_batch(self, ibatch: int, nbatch: int):
        """ggml_opt_dataset_get_batch."""
        sl = slice(ibatch * nbatch, (ibatch + 1) * nbatch)
        lab = self.labels[sl] if self.labels is not None else None
        return self.data[sl], lab


@dataclass
class Result:
    """ggml_opt_result: per-batch loss history + correct-count accumulation.

    loss(): (mean loss, uncertainty) where uncertainty is the standard error
    over batches (reference computes sqrt(var/(n-1)) of the per-batch values).
    accuracy(): (ncorrect/ndata, binomial standard error) — NaN when the loss
    type has no argmax notion, matching ggml_opt_result_accuracy.
    """

    losses: list[float] = field(default_factory=list)
    ncorrect: int = 0
    ndata: int = 0
    has_accuracy: bool = False

    def push(self, loss: float, ncorrect: int | None, nbatch: int):
        self.losses.append(float(loss))
        self.ndata += nbatch
        if ncorrect is not None:
            self.ncorrect += int(ncorrect)
            self.has_accuracy = True

    def loss(self) -> tuple[float, float]:
        if not self.losses:
            return float("nan"), float("nan")
        mean = float(np.mean(self.losses))
        if len(self.losses) < 2:
            return mean, float("nan")
        unc = float(np.std(self.losses, ddof=1) / math.sqrt(len(self.losses)))
        return mean, unc

    def accuracy(self) -> tuple[float, float]:
        if not self.has_accuracy or self.ndata == 0:
            return float("nan"), float("nan")
        p = self.ncorrect / self.ndata
        return p, math.sqrt(max(p * (1.0 - p), 0.0) / self.ndata)


def _loss_and_correct(loss_type: LossType):
    """Build (loss, ncorrect|None) from outputs+labels inside jit."""
    import jax.numpy as jnp

    def fn(outputs, labels):
        if loss_type == LossType.MEAN:
            return jnp.mean(outputs), None
        if loss_type == LossType.SUM:
            return jnp.sum(outputs), None
        if loss_type == LossType.MEAN_SQUARED_ERROR:
            return jnp.mean((outputs - labels) ** 2), None
        # CROSS_ENTROPY: outputs are logits [nb, nclass]; labels are class
        # ids [nb] or probability rows [nb, nclass]
        import jax

        logp = jax.nn.log_softmax(outputs.astype(jnp.float32), axis=-1)
        if labels.ndim == outputs.ndim:
            nll = -jnp.sum(labels * logp, axis=-1).mean()
            tgt = jnp.argmax(labels, axis=-1)
        else:
            nll = -jnp.take_along_axis(
                logp, labels[..., None].astype(jnp.int32), axis=-1).mean()
            tgt = labels
        ncorrect = jnp.sum(jnp.argmax(outputs, axis=-1) == tgt)
        return nll, ncorrect

    return fn


def _make_steps(apply_fn, loss_type: LossType):
    import jax
    import optax

    lc = _loss_and_correct(loss_type)

    def loss_fn(params, inputs, labels):
        out = apply_fn(params, inputs)
        loss, ncorrect = lc(out, labels)
        return loss, ncorrect

    # inject_hyperparams so the per-epoch get_opt_pars callback can retune
    # lr/wd without recompiling (ggml_opt_fit's get_opt_pars-by-epoch)
    opt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, state, inputs, labels):
        (loss, ncorrect), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, inputs, labels)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss, ncorrect

    @jax.jit
    def eval_step(params, inputs, labels):
        return loss_fn(params, inputs, labels)

    return opt, train_step, eval_step


def _set_hparams(state, pars: AdamWParams):
    state.hyperparams["learning_rate"] = pars.alpha
    state.hyperparams["b1"] = pars.beta1
    state.hyperparams["b2"] = pars.beta2
    state.hyperparams["eps"] = pars.eps
    state.hyperparams["weight_decay"] = pars.wd
    return state


def epoch(params, state, train_step, eval_step, dataset: Dataset,
          nbatch: int, idata_split: int,
          result_train: Result, result_eval: Result,
          callback: Callable | None = None):
    """ggml_opt_epoch (ggml-opt.h:181): train on batches below idata_split,
    evaluate on the rest. Returns updated (params, state)."""
    import jax.numpy as jnp

    nbatches = dataset.ndata // nbatch
    split_batch = idata_split // nbatch
    for ib in range(nbatches):
        x, y = dataset.get_batch(ib, nbatch)
        x = jnp.asarray(x)
        y = None if y is None else jnp.asarray(y)
        if ib < split_batch:
            params, state, loss, ncorrect = train_step(params, state, x, y)
            result_train.push(loss, None if ncorrect is None else int(ncorrect), nbatch)
            if callback:
                callback(True, ib, nbatches, result_train)
        else:
            loss, ncorrect = eval_step(params, x, y)
            result_eval.push(loss, None if ncorrect is None else int(ncorrect), nbatch)
            if callback:
                callback(False, ib, nbatches, result_eval)
    return params, state


def fit(apply_fn, params, dataset: Dataset, *,
        loss_type: LossType = LossType.CROSS_ENTROPY,
        nepoch: int = 1, nbatch: int = 32, val_split: float = 0.0,
        get_opt_pars: Callable[[int], AdamWParams] | AdamWParams | None = None,
        callback: Callable | None = None, silent: bool = False,
        seed: int = 0) -> tuple[Any, list[tuple[Result, Result]]]:
    """ggml_opt_fit (ggml-opt.h:207): the one-call training driver.

    apply_fn(params, inputs) -> outputs must be jittable. Returns the
    trained params and one (train Result, eval Result) pair per epoch.
    """
    import logging

    log = logging.getLogger(__name__)
    rng = np.random.default_rng(seed)
    opt, train_step, eval_step = _make_steps(apply_fn, loss_type)
    state = opt.init(params)

    nbatch = min(nbatch, max(dataset.ndata, 1))
    nbatches = dataset.ndata // nbatch
    split_batch = max(int(round(nbatches * (1.0 - val_split))), 1)
    idata_split = split_batch * nbatch

    history: list[tuple[Result, Result]] = []
    for ep in range(nepoch):
        if callable(get_opt_pars):
            state = _set_hparams(state, get_opt_pars(ep))
        elif isinstance(get_opt_pars, AdamWParams):
            state = _set_hparams(state, get_opt_pars)
        dataset.shuffle(rng, idata_split)
        rt, re = Result(), Result()
        params, state = epoch(params, state, train_step, eval_step, dataset,
                              nbatch, idata_split, rt, re, callback)
        history.append((rt, re))
        if not silent:
            tl, tu = rt.loss()
            el, _ = re.loss()
            acc, _ = rt.accuracy()
            log.info("epoch %d/%d: train loss %.6f±%.6f acc %.4f  val loss %.6f",
                     ep + 1, nepoch, tl, tu if tu == tu else 0.0, acc, el)
    return params, history
