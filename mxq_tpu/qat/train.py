"""QAT finetune with knowledge distillation — the TPU rebuild of
LLM-QAT/train.py + utils/kd_trainer.py, on optax + pjit sharding instead of
HF Trainer + torch FSDP.

* KD loss = KL(teacher softmax ‖ student log-softmax), no CE mixing
  (kd_trainer.py:42-48,71-79).
* Teacher runs frozen under stop_gradient (the reference needed FSDP
  ``ignored_modules`` gymnastics for this, kd_trainer.py:251-253; in JAX the
  teacher params are just another sharded pytree).
* Student weights fake-quantized with STE on every forward (train=True path
  of models.llama.quant_linear).
* Gradient checkpointing per decoder layer via jax.checkpoint
  (reference: gradient_checkpointing_enable, run_train.sh:27).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from mxq_tpu.models import llama


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5          # run_train.sh:24
    weight_decay: float = 0.0
    warmup_steps: int = 0
    total_steps: int = 1000
    use_kd: bool = True                  # run_train.sh:41
    kd_loss_scale: float = 1.0           # run_train.sh:42 (process_args.py:86)
    temperature: float = 1.0
    grad_clip: float = 1.0
    remat: bool = True


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.warmup_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, tc.learning_rate, tc.warmup_steps, tc.total_steps)
    else:
        sched = optax.cosine_decay_schedule(tc.learning_rate, tc.total_steps)
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(sched, weight_decay=tc.weight_decay),
    )


def kd_loss_fn(student_logits: jax.Array, teacher_logits: jax.Array,
               mask: jax.Array, scale: float = 1.0) -> jax.Array:
    """CausalLMLossKD (kd_trainer.py:38-48): mean over tokens of
    KL(softmax(teacher) ‖ log_softmax(student)), scaled."""
    t = jax.nn.softmax(teacher_logits, axis=-1)
    ls = jax.nn.log_softmax(student_logits, axis=-1)
    lt = jax.nn.log_softmax(teacher_logits, axis=-1)
    kl = jnp.sum(t * (lt - ls), axis=-1)          # [B, T]
    m = mask.astype(kl.dtype)
    return scale * jnp.sum(kl * m) / jnp.maximum(jnp.sum(m), 1.0)


def loss_fn(params, teacher_params, batch, cfg: llama.LlamaConfig,
            teacher_cfg: llama.LlamaConfig, tc: TrainConfig):
    ids = batch["input_ids"]
    labels = batch.get("labels", ids)
    logits, _ = llama.forward(params, ids, cfg, train=True, remat=tc.remat)
    if tc.use_kd and teacher_params is not None:
        t_logits, _ = llama.forward(
            jax.lax.stop_gradient(teacher_params), ids, teacher_cfg,
            train=False, remat=tc.remat)
        mask = labels != -100
        loss = kd_loss_fn(logits, jax.lax.stop_gradient(t_logits), mask,
                          tc.kd_loss_scale)
    else:
        loss = llama.cross_entropy_loss(logits, labels)
    return loss


def make_train_step(cfg: llama.LlamaConfig, tc: TrainConfig,
                    optimizer: optax.GradientTransformation,
                    teacher_cfg: Optional[llama.LlamaConfig] = None):
    """Returns train_step(params, teacher_params, opt_state, batch) ->
    (params, opt_state, metrics). jit/pjit-ready (donate params+opt_state)."""
    teacher_cfg = teacher_cfg or dataclasses.replace(
        cfg, w_bits=32, a_bits=32, kv_bits=32)

    def train_step(params, teacher_params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, teacher_params, batch, cfg, teacher_cfg, tc)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def eval_ppl_step(params, batch, cfg: llama.LlamaConfig):
    """eval metric = exp(eval_loss) (train.py:137-148)."""
    logits, _ = llama.forward(params, batch["input_ids"], cfg)
    loss = llama.cross_entropy_loss(logits, batch.get("labels",
                                                      batch["input_ids"]))
    return loss
