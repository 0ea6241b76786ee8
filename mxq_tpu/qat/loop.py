"""QAT training loop with checkpointing — the Trainer-loop analogue of
LLM-QAT/train.py:118-151 on orbax instead of HF Trainer checkpoints
(run_train.sh:28-31: save every N steps, keep last; final save drops the
teacher, utils/utils.py:39-49 — here the teacher is simply never part of the
student pytree, so nothing needs stripping)."""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama
from mxq_tpu.parallel import sharding
from mxq_tpu.qat import train as train_mod


@dataclasses.dataclass
class LoopConfig:
    output_dir: str = "out/qat"
    save_steps: int = 1000           # run_train.sh:29
    save_total_limit: int = 1        # run_train.sh:31
    log_steps: int = 10
    max_steps: Optional[int] = None
    # metrics backend (run_train.sh:30 `--report_to tensorboard` analogue):
    # TensorBoard event files + metrics.jsonl under <output_dir>/logs.
    # None disables; "auto" derives from output_dir.
    logdir: Optional[str] = "auto"


def _ckpt_mgr(path: str, limit: int):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=limit,
                                             create=True))


def save_checkpoint(mgr, step: int, params, opt_state) -> None:
    import orbax.checkpoint as ocp
    mgr.save(step, args=ocp.args.Composite(
        params=ocp.args.StandardSave(params),
        opt_state=ocp.args.StandardSave(opt_state)))
    mgr.wait_until_finished()


def restore_checkpoint(mgr, params_like, opt_state_like):
    """Returns (params, opt_state, steps_completed). Checkpoint labels ARE
    the number of completed steps, so the label is the resume point."""
    import orbax.checkpoint as ocp
    step = mgr.latest_step()
    if step is None:
        return None, None, 0
    restored = mgr.restore(step, args=ocp.args.Composite(
        params=ocp.args.StandardRestore(params_like),
        opt_state=ocp.args.StandardRestore(opt_state_like)))
    return restored["params"], restored["opt_state"], step


def run_training(params, teacher_params, cfg: llama.LlamaConfig,
                 tc: train_mod.TrainConfig, lc: LoopConfig,
                 data_iter: Iterator[dict],
                 mesh=None, resume: bool = True,
                 log=print, val_batches=None) -> dict:
    """Train until data or max_steps runs out; returns final params.

    Elastic recovery: on restart with the same output_dir the latest
    checkpoint is restored and training resumes at the saved step (crash =
    rerun was the reference's only story, SURVEY.md §5).

    Multi-host: run the same call on every host with a hybrid mesh from
    multihost.make_hybrid_mesh; data_iter must then yield each host's OWN
    batch slice (multihost.host_local_slice of the global batch) — the
    loop stitches them into global arrays and logs/saves from the
    coordinator (orbax writes are collective; every host participates)."""
    from mxq_tpu.parallel import multihost
    from mxq_tpu.utils.metrics import MetricsWriter
    multi = jax.process_count() > 1
    coordinator = not multi or multihost.is_coordinator()
    if not coordinator:
        log = lambda *_a, **_k: None  # noqa: E731 — log once, on host 0
    logdir = lc.logdir
    if logdir == "auto":
        logdir = os.path.join(lc.output_dir, "logs")
    writer = MetricsWriter(logdir if coordinator else None)
    opt = train_mod.make_optimizer(tc)
    if mesh is not None:
        params = sharding.shard_params(params, mesh)
        if teacher_params is not None:
            teacher_params = sharding.shard_params(teacher_params, mesh)
    opt_state = jax.jit(opt.init)(params)

    mgr = _ckpt_mgr(lc.output_dir, lc.save_total_limit)
    start_step = 0
    if resume:
        p, o, start_step = restore_checkpoint(mgr, params, opt_state)
        if p is not None:
            params, opt_state = p, o
            # Fast-forward the data stream so a resumed run continues the
            # token mix instead of retraining on the first start_step batches
            # (same shuffle seed on restart).
            for _ in range(start_step):
                if next(data_iter, None) is None:
                    break
            log(f"resumed from step {start_step}")

    step_fn = jax.jit(train_mod.make_train_step(cfg, tc, opt),
                      donate_argnums=(0, 2))

    losses = []
    t0 = time.time()
    step = start_step                 # = steps COMPLETED so far
    for batch in data_iter:
        if lc.max_steps is not None and step >= lc.max_steps:
            break
        if mesh is not None:
            batch = (multihost.global_batch(batch, mesh) if multi
                     else sharding.shard_batch(batch, mesh))
        params, opt_state, metrics = step_fn(params, teacher_params,
                                             opt_state, batch)
        step += 1
        if step % lc.log_steps == 0:
            loss = float(metrics["loss"])
            losses.append(loss)
            s_per_step = (time.time() - t0) / lc.log_steps
            log(f"step {step}: loss={loss:.4f} "
                f"gnorm={float(metrics['grad_norm']):.3f} "
                f"({s_per_step:.2f}s/step)")
            writer.log(step, **{"train/loss": loss,
                                "train/grad_norm":
                                    float(metrics["grad_norm"]),
                                "train/seconds_per_step": s_per_step})
            t0 = time.time()
        if step % lc.save_steps == 0:
            save_checkpoint(mgr, step, params, opt_state)

    if step == 0 or step % lc.save_steps != 0:
        save_checkpoint(mgr, step, params, opt_state)
    out = {"params": params, "opt_state": opt_state, "last_step": step,
           "losses": losses}
    if val_batches:
        # end-of-training eval metric = exp(mean eval loss), the reference's
        # protocol (train.py:137-148)
        ev = jax.jit(lambda p, b: train_mod.eval_ppl_step(p, b, cfg))
        tot = 0.0
        for vb in val_batches:
            if mesh is not None:
                vb = (multihost.global_batch(vb, mesh) if multi
                      else sharding.shard_batch(vb, mesh))
            tot += float(ev(params, vb))
        out["eval_ppl"] = float(np.exp(tot / len(val_batches)))
        log(f"eval ppl (exp of mean val loss): {out['eval_ppl']:.4f}")
        writer.log(step, **{"eval/ppl": out["eval_ppl"]})
    writer.close()
    return out
