"""Training loop: jitted train step with in-step gradient accumulation,
optax AdamW + linear schedule, two-loss logging, epoch→step rescheduling,
and orbax checkpoint rotation.

This is the TPU-native replacement for HF ``Trainer`` as the reference uses
it (SURVEY §2b "HF Trainer"): the whole optimizer step — ``accum``
microbatch forward/backwards accumulated via ``lax.scan``, gradient mean,
clip, AdamW update — is ONE compiled program running under the device mesh
(gradient all-reduce over the ``data`` axis is inserted by XLA, SURVEY §5
"distributed communication backend").

Reference-equivalent semantics:
- loss = backbone CE + amortized decoder CE (``modeling_csm.py:372-465``),
  grads averaged over accumulation microbatches (HF Trainer behavior);
- per-step logging of ``train/backbone_loss`` and ``train/decoder_loss``
  (``train.py:303-326``);
- the epoch-repetition dataset plus epoch→steps save/eval rescheduling:
  ``steps_per_old_epoch = ceil(N / (bs·accum·data_parallel))`` and
  ``num_train_epochs`` folded into the repeated dataset
  (``train.py:414-467``);
- AdamW lr 5e-6 default, linear decay to 0 (HF default schedule), grad
  clipping at ``max_grad_norm``.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from csm_tpu.config import CSMConfig
from csm_tpu.models import csm
from csm_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_sharding, put_global_batch,
)

logger = logging.getLogger(__name__)


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32


def make_optimizer(
    learning_rate: float,
    total_steps: int,
    warmup_steps: int = 0,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + HF-default linear decay schedule + global-norm clipping."""
    if warmup_steps > 0:
        # Linear warmup to peak, then linear decay to zero (HF
        # ``get_linear_schedule_with_warmup`` shape).
        schedule = optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.schedules.linear_schedule(
                    learning_rate, 0.0,
                    max(total_steps - warmup_steps, 1),
                ),
            ],
            [warmup_steps],
        )
    else:
        schedule = optax.schedules.linear_schedule(
            learning_rate, 0.0, max(total_steps, 1)
        )
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )


def make_train_step(
    config: CSMConfig,
    optimizer: optax.GradientTransformation,
    max_decoder_frames: int,
    compute_dtype=None,
    lora_cfg: Optional[dict] = None,
    remat: bool = True,
    remat_policy: str = "auto",
    use_flash: bool = True,
    decoder_frame_sharding=None,
    sp_mesh=None,
) -> Callable:
    """Build the jitted train step.

    The batch is ``[accum, B, S, 33]``; microbatches are scanned, gradients
    averaged (HF grad-accum semantics), then one optimizer update applied.
    Returns ``(state, metrics)`` with the two-loss split.

    With ``lora_cfg={"alpha": a, "rank": r}``, ``state.params`` holds ONLY
    the adapters: the step takes an extra frozen ``base_params`` argument,
    merges adapters inside the jit, and updates adapters alone (the base
    never receives gradients or optimizer state).
    """
    if remat_policy not in ("auto", "nothing", "dots"):
        raise ValueError(
            f"remat_policy must be 'auto', 'nothing', or 'dots'; "
            f"got {remat_policy!r}"
        )

    def loss_fn(train_params, base_params, microbatch):
        if lora_cfg is not None:
            from csm_tpu.train.lora import apply_lora

            params = apply_lora(
                base_params, train_params, lora_cfg["alpha"], lora_cfg["rank"]
            )
        else:
            params = train_params
        if compute_dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                params,
            )
        # "auto" remat policy, resolved at trace time from the microbatch:
        # "dots" (save matmul outputs, skip recomputing projections/MLP in
        # the backward — measured −9 % step time at 1B S=2048) costs
        # ~65 MB × layers × B of extra residency, so it is only a free win
        # at microbatch 1; larger microbatches keep the save-nothing
        # minimum-memory policy.
        policy = remat_policy
        if policy == "auto":
            policy = "dots" if microbatch["input_ids"].shape[0] == 1 else "nothing"
        out = csm.forward(
            params,
            config,
            microbatch["input_ids"],
            microbatch["attention_mask"],
            labels=microbatch["labels"],
            max_decoder_frames=max_decoder_frames,
            # The flash kernel carries a Pallas backward (custom_vjp) since
            # round 3 — gradients flow through it on eligible shapes; remat
            # recomputes each backbone layer in the backward so full-context
            # training fits in HBM.  Sequence-parallel meshes pass sp_mesh:
            # the kernel then runs under shard_map over the "seq" axis with
            # a per-shard query offset (ops.flash_attention.flash_attention_sp);
            # SP shapes the kernel's blocking can't cover fall back to XLA
            # attention (K/V all-gathers inserted by the partitioner).
            use_flash=use_flash,
            sp_mesh=sp_mesh,
            remat=remat,
            remat_policy=policy,
            # Mesh runs: shard the gathered decoder-loss frames (see
            # csm.forward — they otherwise replicate per device).
            decoder_frame_sharding=decoder_frame_sharding,
        )
        return out.loss, {
            "backbone_loss": out.backbone_loss,
            "decoder_loss": out.decoder_loss,
        }

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, base_params, batch: Dict[str, jnp.ndarray]):
        accum = batch["input_ids"].shape[0]

        def micro(carry, mb):
            grads_acc, loss_acc, aux_acc = carry
            (loss, aux), grads = grad_fn(state.params, base_params, mb)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            aux_acc = jax.tree.map(jnp.add, aux_acc, aux)
            return (grads_acc, loss_acc + loss, aux_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        zero_aux = {"backbone_loss": jnp.float32(0), "decoder_loss": jnp.float32(0)}
        (grads, loss, aux), _ = jax.lax.scan(
            micro, (zero_grads, jnp.float32(0), zero_aux), batch
        )
        scale = 1.0 / accum
        grads = jax.tree.map(lambda g: (g * scale).astype(g.dtype), grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss * scale,
            "backbone_loss": aux["backbone_loss"] * scale,
            "decoder_loss": aux["decoder_loss"] * scale,
            "grad_norm": optax.global_norm(grads),
        }
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step


class CSMTrainer:
    """HF-Trainer-equivalent orchestration (reference ``CSMTrainer`` +
    ``main``, ``train.py:303-512``) over a device mesh.

    The dataset is expected to use the epoch-repetition trick
    (``num_train_epochs`` folded into ``__len__``); this trainer runs ONE
    pass over it and converts epoch-based save/eval cadence to steps
    (``train.py:414-467``).
    """

    def __init__(
        self,
        config: CSMConfig,
        params: dict,
        args,  # TrainingArguments
        train_dataset,
        eval_dataset=None,
        data_collator=None,
        mesh=None,
    ):
        from csm_tpu.train.args import TrainingArguments  # noqa: F401

        self.config = config
        self.args = args
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.data_collator = data_collator
        self.mesh = mesh if mesh is not None else make_mesh(
            data=args.mesh_data, model=args.mesh_model,
            seq=getattr(args, "mesh_seq", 1),
        )
        # Sequence parallelism shards the frame axis of every microbatch;
        # the flash kernel can't be SPMD-partitioned over that axis, so SP
        # training routes attention through the XLA path.
        self._seq = int(dict(self.mesh.shape).get("seq", 1))

        dp = int(self.mesh.shape["data"])
        self.global_batch = args.per_device_train_batch_size * dp
        n_items = len(train_dataset)
        # ceil: the trailing partial accumulation window is trained on too
        # (_batches tops it up by repeating items), matching HF Trainer's
        # no-drop-last default rather than silently losing samples.
        self.total_steps = max(
            1,
            math.ceil(n_items / (self.global_batch * args.gradient_accumulation_steps)),
        )

        # Epoch→steps rescheduling (``train.py:414-467``): an "old epoch" is
        # one pass over the un-repeated data.
        original_size = len(getattr(train_dataset, "data", train_dataset))
        eff_batch = self.global_batch * args.gradient_accumulation_steps
        self.steps_per_old_epoch = max(1, math.ceil(original_size / eff_batch))
        self.save_steps = (
            self.steps_per_old_epoch
            if args.save_strategy == "epoch"
            else args.save_steps * self.steps_per_old_epoch
            if args.save_strategy == "steps"
            else None
        )
        self.eval_steps = (
            self.steps_per_old_epoch
            if args.eval_strategy == "epoch"
            else args.eval_steps * self.steps_per_old_epoch
            if args.eval_strategy == "steps"
            else None
        )

        optimizer = make_optimizer(
            args.learning_rate,
            self.total_steps,
            args.warmup_steps,
            args.weight_decay,
            args.max_grad_norm,
        )
        self.optimizer = optimizer

        max_dec = max(
            1,
            (self.global_batch * args.max_seq_length)
            // getattr(train_dataset, "amortization_ratio", 16),
        ) + self.global_batch
        self._max_dec = max_dec
        if args.bf16:
            compute_dtype = jnp.bfloat16
        elif getattr(args, "fp16", False):
            compute_dtype = jnp.float16
        else:
            compute_dtype = None

        # LoRA mode: train ONLY rank-r adapters; the base checkpoint is a
        # frozen (non-donated) step argument.
        self.lora_rank = int(getattr(args, "lora_rank", 0) or 0)
        self.lora_alpha = float(getattr(args, "lora_alpha", 16.0))
        lora_cfg = (
            {"alpha": self.lora_alpha, "rank": self.lora_rank}
            if self.lora_rank > 0 else None
        )
        step_fn = make_train_step(
            config, optimizer, max_dec, compute_dtype=compute_dtype,
            lora_cfg=lora_cfg,
            remat=bool(getattr(args, "gradient_checkpointing", True)),
            remat_policy=str(getattr(args, "gradient_checkpointing_policy",
                                     "nothing")),
            # seq > 1: the flash kernel runs under shard_map over the mesh's
            # "seq" axis (per-shard query offset); ineligible shapes fall
            # back to XLA attention inside backbone_forward.
            use_flash=True,
            sp_mesh=self.mesh if self._seq > 1 else None,
            # Shard the gathered decoder-loss frames over the whole
            # data x seq device grid (they replicate otherwise — the
            # largest SP activation at 1B; scripts/check_sp_memory.py).
            # Only name axes the user's mesh actually has (a custom mesh
            # without 'seq' is supported elsewhere in this class).
            decoder_frame_sharding=tuple(
                a for a in ("data", "seq") if a in dict(self.mesh.shape)
            ) or None,
        )

        with self.mesh:
            params = jax.device_put(params, param_sharding(self.mesh, params))
            if lora_cfg is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from csm_tpu.train.lora import init_lora_params

                targets = tuple(
                    t for t in getattr(args, "lora_targets", "wq,wv").split(",") if t
                )
                self.base_params = params
                train_params = jax.device_put(
                    init_lora_params(
                        jax.random.key(args.seed), params, self.lora_rank, targets
                    ),
                    NamedSharding(self.mesh, PartitionSpec()),
                )
            else:
                self.base_params = None
                train_params = params
            opt_state = jax.jit(optimizer.init)(train_params)
            self.state = TrainState(
                params=train_params, opt_state=opt_state, step=jnp.int32(0)
            )
        self._step_fn = jax.jit(step_fn, donate_argnums=(0,))
        # Jitted once here: a per-evaluate() jax.jit would recompile on every
        # evaluation pass.  The decoder-frame bound reuses the training-path
        # formula — eval batches can hold up to global_batch*(S/ratio)+gb
        # valid decoder frames, and a smaller cap would silently drop the
        # later frames from eval_loss.
        def _eval_out(out):
            # Per-batch (mean, count) pairs for both losses: evaluate()
            # aggregates token-weighted, matching HF Trainer eval semantics
            # (``/root/reference/train.py:303-326``).
            return (out.backbone_loss, out.backbone_targets,
                    out.decoder_loss, out.decoder_targets)

        if lora_cfg is not None:
            from csm_tpu.train.lora import apply_lora

            self._eval_fn = jax.jit(
                lambda tp, bp, b: _eval_out(csm.forward(
                    apply_lora(bp, tp, self.lora_alpha, self.lora_rank),
                    self.config, b["input_ids"], b["attention_mask"],
                    labels=b["labels"], max_decoder_frames=self._max_dec,
                    sp_mesh=self.mesh if self._seq > 1 else None,
                ))
            )
        else:
            self._eval_fn = jax.jit(
                lambda p, _bp, b: _eval_out(csm.forward(
                    p, self.config, b["input_ids"], b["attention_mask"],
                    labels=b["labels"], max_decoder_frames=self._max_dec,
                    sp_mesh=self.mesh if self._seq > 1 else None,
                ))
            )
        self._metrics_log: list = []

    # ------------------------------------------------------------------

    def _batches(self, skip_items: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield ``[accum, global_batch, S, 33]`` batches from the dataset.

        A trailing partial accumulation window is topped up by repeating its
        items (round-robin) so every sample trains at least once and shapes
        stay static — no silent drop (HF Trainer's no-drop-last default).

        ``skip_items``: resume fast-forward by index math — the skipped
        items are never loaded (no replayed audio I/O or Mimi encodes).
        """
        args = self.args
        accum = args.gradient_accumulation_steps
        need = self.global_batch * accum
        buf = []
        for i in range(skip_items, len(self.train_dataset)):
            buf.append(self.train_dataset[i])
            if len(buf) == need:
                yield self._collate_group(buf, accum)
                buf = []
        if buf:
            n = len(buf)
            buf = [buf[j % n] for j in range(need)]
            yield self._collate_group(buf, accum)

    def _prefetched(self, it: Iterator) -> Iterator:
        """Bounded background prefetch over a batch iterator.

        The reference overlaps data work with device steps for free via
        DataLoader workers (``/root/reference/train.py:253-255``) — and its
        survey-noted cost (Mimi encode inside ``__getitem__``) applies
        here too.  A daemon thread materializes item i+k (audio decode,
        Mimi encode, collation, host→device transfer) while the device
        runs step i; the queue is bounded (``args.dataloader_prefetch``,
        default 2) so at most that many global batches sit in flight.
        Exceptions in the worker re-raise in the training loop.  Depth 0
        disables (fully synchronous, the pre-round-4 behavior).
        """
        depth = int(getattr(self.args, "dataloader_prefetch", 2) or 0)
        if depth <= 0:
            yield from it
            return
        import queue as queue_mod
        import threading

        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)
        sentinel = object()
        stop = threading.Event()  # consumer gone: worker must not block

        def put_or_stop(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            try:
                for item in it:
                    if not put_or_stop(item):
                        return
                put_or_stop(sentinel)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put_or_stop(e)

        threading.Thread(
            target=worker, daemon=True, name="csm-batch-prefetch"
        ).start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Abandoned mid-stream (checkpoint/eval raised, Ctrl-C, early
            # break): release the worker — otherwise it parks in put() on
            # a full queue forever, pinning depth+1 device-resident batches
            # per aborted train().
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue_mod.Empty:
                pass

    def _collate_group(self, buf, accum):
        collated = self.data_collator(buf)
        return {
            k: v.reshape(accum, self.global_batch, *v.shape[1:])
            for k, v in collated.items()
        }

    def _maybe_resume(self) -> int:
        """Restore the latest checkpoint if requested; returns the step to
        resume from (0 = fresh run)."""
        if not getattr(self.args, "resume_from_checkpoint", False):
            return 0
        from csm_tpu.checkpoint import latest_step, load_checkpoint

        ckpt_dir = f"{self.args.output_dir}/checkpoints"
        step = latest_step(ckpt_dir)
        if step is None:
            logger.info("resume requested but no checkpoint found; starting fresh")
            return 0
        restored = load_checkpoint(
            ckpt_dir, step,
            template={"params": self.state.params,
                      "opt_state": self.state.opt_state, "step": 0},
        )
        # Re-apply the mesh shardings to params (orbax restores onto a single
        # device; the jitted step rejects mixed committed placements).  The
        # optimizer state is rebuilt as UNCOMMITTED host arrays so the step
        # function is free to place each leaf where its compiled layout
        # expects it.
        params = jax.device_put(
            restored["params"],
            jax.tree.map(lambda x: x.sharding, self.state.params),
        )
        opt_state = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)), restored["opt_state"]
        )
        self.state = TrainState(
            params=params, opt_state=opt_state, step=jnp.int32(step),
        )
        logger.info("resumed from checkpoint at step %d", step)
        return step

    def train(self) -> Dict[str, float]:
        args = self.args
        sharding = batch_sharding(self.mesh)
        # Microbatch axis replicated, batch axis data-sharded, frame axis
        # seq-sharded.  Frame counts the ``seq`` axis doesn't divide fall
        # back to replicated frames per batch (length bucketing keeps
        # bucket sizes divisible in practice).
        mb_sharding = NamedSharding(self.mesh, P(None, "data"))
        mb_sharding_seq = (
            NamedSharding(self.mesh, P(None, "data", "seq"))
            if self._seq > 1 else mb_sharding
        )
        logger.info(
            "training: %d steps (global batch %d × accum %d), mesh %s",
            self.total_steps, self.global_batch,
            args.gradient_accumulation_steps, dict(self.mesh.shape),
        )
        start_step = self._maybe_resume()
        last = {}
        t0 = time.time()
        need = self.global_batch * args.gradient_accumulation_steps
        # Resume fast-forwards by INDEX (O(1)): skipped items are never
        # loaded, so no replayed audio decode / Mimi encode per skipped
        # step.  Amortization draws stay reproducible because the
        # dataset seeds its RNG per item index.
        def device_batches():
            # Host→device placement happens HERE so the prefetch thread
            # overlaps the transfer too (put_global_batch carries its
            # sharding explicitly — no ambient-mesh dependence).
            for batch in self._batches(skip_items=start_step * need):
                s_len = batch["input_ids"].shape[2]
                yield put_global_batch(
                    batch,
                    mb_sharding_seq if s_len % self._seq == 0 else mb_sharding,
                )

        from csm_tpu.train.reporting import make_reporter

        reporter = make_reporter(
            getattr(args, "report_to", "none"), f"{args.output_dir}/runs"
        )
        try:
            with self.mesh:
                for step, batch in enumerate(
                    self._prefetched(device_batches()), start=start_step + 1
                ):
                    self.state, metrics = self._step_fn(
                        self.state, self.base_params, batch
                    )
                    if args.logging_steps and step % args.logging_steps == 0:
                        last = {k: float(v) for k, v in metrics.items()}
                        last["step"] = step
                        last["time"] = time.time() - t0
                        self._metrics_log.append(last)
                        reporter.log(step, last)
                        logger.info(
                            "step %d | loss %.4f | train/backbone_loss %.4f | "
                            "train/decoder_loss %.4f",
                            step, last["loss"], last["backbone_loss"],
                            last["decoder_loss"],
                        )
                    if self.save_steps and step % self.save_steps == 0:
                        self.save_checkpoint(step)
                    if (
                        self.eval_steps
                        and self.eval_dataset is not None
                        and step % self.eval_steps == 0
                    ):
                        last["eval_loss"] = self.evaluate()
                        reporter.log(step, {"eval_loss": last["eval_loss"]})
        finally:
            reporter.close()
        return last

    def evaluate(self) -> float:
        """Token-weighted eval loss over the eval dataset (no grad).

        Each batch's per-loss (mean, target-count) pair is accumulated and
        the final ``eval_loss`` is ``Σ nll / Σ targets`` for the backbone
        and decoder CE separately, summed — i.e. the loss one giant batch
        of the whole eval set would produce, independent of how items pack
        into batches (HF Trainer eval semantics; a per-item mean would
        over-weight tokens from short conversations).

        The trailing partial batch is padded with label-masked copies of
        its own items: all-(-100) labels contribute zero targets, so
        padding cannot shift the aggregate.
        """
        bb_nll = dec_nll = 0.0  # Σ (batch mean × batch target count)
        bb_n = dec_n = 0.0
        buf = []

        def flush():
            nonlocal bb_nll, dec_nll, bb_n, dec_n
            collated = self.data_collator(buf)
            batch = {k: jnp.asarray(v) for k, v in collated.items()}
            bl, bn, dl, dn = map(
                float, self._eval_fn(self.state.params, self.base_params, batch)
            )
            bb_nll += bl * bn
            bb_n += bn
            dec_nll += dl * dn
            dec_n += dn

        with self.mesh:
            for i in range(len(self.eval_dataset)):
                buf.append(self.eval_dataset[i])
                if len(buf) == self.global_batch:
                    flush()
                    buf = []
            if buf:
                n = len(buf)
                masked = [
                    {**buf[j % n], "labels": np.full_like(buf[j % n]["labels"], -100)}
                    for j in range(n, self.global_batch)
                ]
                buf = buf + masked
                flush()
        if bb_n == 0 and dec_n == 0:
            mean = float("nan")
        else:
            mean = (bb_nll / bb_n if bb_n else 0.0) + (
                dec_nll / dec_n if dec_n else 0.0
            )
        logger.info("eval_loss %.4f", mean)
        return mean

    # ------------------------------------------------------------------

    def save_checkpoint(self, step: int) -> None:
        from csm_tpu.checkpoint import save_checkpoint

        save_checkpoint(
            f"{self.args.output_dir}/checkpoints",
            step,
            {"params": self.state.params, "opt_state": self.state.opt_state,
             "step": step},
            max_to_keep=self.args.save_total_limit,
        )
        logger.info("saved checkpoint at step %d", step)

    def save_model(self, output_dir: Optional[str] = None) -> None:
        """Final model save: params + config JSON (reference
        ``trainer.save_model``, ``train.py:506-508``).

        In LoRA mode the MERGED model is exported (loads anywhere a full
        checkpoint would, including the PyTorch reference) and the raw
        adapters are saved alongside under ``adapters/``.
        """
        import os

        from csm_tpu.checkpoint import save_checkpoint

        out = output_dir or self.args.output_dir
        os.makedirs(out, exist_ok=True)
        self.config.to_json(os.path.join(out, "config.json"))
        params = self.state.params
        if self.lora_rank > 0:
            from csm_tpu.train.lora import merge_lora

            save_checkpoint(os.path.join(out, "adapters"), 0,
                            {"lora": self.state.params}, max_to_keep=1)
            params = merge_lora(
                self.base_params, self.state.params,
                self.lora_alpha, self.lora_rank,
            )
        save_checkpoint(os.path.join(out, "model"), 0, {"params": params},
                        max_to_keep=1)
        logger.info("model saved at %s", out)
