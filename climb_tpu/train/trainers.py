"""Vision-language task trainers.

The reference implements four copies of the same skeleton
(train_vqa/train_nlvr2/train_snli_ve/train_vcr — SURVEY.md section 2.2);
here ONE ``VLTaskTrainer`` parameterized by the task registry covers all
four plus their low-shot variants, while keeping the reference's
``TaskTrainer`` protocol (``task_trainer.py:5-14`` / ADD_NEW_TASKS.md):
``__init__(args, task_configs, model_config, device)``, ``train(model,
replay_memory, ewc)``, ``eval(model)``, ``eval_forgetting(model,
model_path)``, ``get_train_dataloader()``, ``get_collate_fn()``.

Skeleton parity (e.g. train_snli_ve.py:159-228): AdamW + poly-warmup
schedule, epoch loop -> jitted train step -> optional replay step every
``replay_frequency`` steps -> wandb log every ``log_freq``; per-epoch eval;
best checkpoint kept (host copy instead of the reference's in-RAM
``copy.deepcopy``).
"""

import logging
import pickle
import random as py_random
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from climb_tpu.data.collation import stack_collate
from climb_tpu.data.loader import DataLoader
from climb_tpu.data.synthetic import make_synthetic_vl_dataset
from climb_tpu.parallel.sharding import shard_batch
from climb_tpu.train.bundle import CLModel
from climb_tpu.train.optimizer import make_optimizer
from climb_tpu.train.train_state import TrainState
from climb_tpu.train.train_step import make_eval_step, make_train_step
from climb_tpu.utils.wandb import wandb_logger

logger = logging.getLogger(__name__)

LOSS_TYPES = {
    "vqa": "vqa_bce",
    "nlvr2": "ce",
    "snli-ve": "ce",
    "vcr": "mc_ce",
}


def batch_divisor(task_cfg: dict) -> int:
    """Reference quirk: dataloader batch = global/2 for NLVR2 (2 images,
    nlvr2_dataset.py:186) and /4 for VCR (4 choices, vcr_dataset.py:232)."""
    if task_cfg.get("model_type") == "multi-choice":
        return task_cfg.get("num_choices", 4)
    return task_cfg.get("num_images", 1)


class TaskTrainer:
    """Abstract protocol (parity: reference task_trainer.py:5-14)."""

    def __init__(self, args, task_configs, model_config, device=None):
        raise NotImplementedError


class VLTaskTrainer(TaskTrainer):
    task_key: str = None  # set by subclasses / factory
    low_shot: bool = False

    def __init__(self, args, task_configs, model_config, device=None, task_key=None):
        if task_key is not None:
            self.task_key = task_key
        self.args = args
        self.device = device  # accepted for protocol parity; mesh used instead
        self.task_cfg = task_configs[self.task_key]
        self.model_config = model_config
        self.loss_type = LOSS_TYPES[self.task_key]

        tc = self.task_cfg
        self.num_epochs = tc["num_epochs"]
        self.lr = tc["lr"]
        self.weight_decay = tc["weight_decay"]
        self.adam_epsilon = tc["adam_epsilon"]
        self.warmup_ratio = tc["warmup_ratio"]
        self.batch_size = max(1, args.batch_size // batch_divisor(tc))
        self.eval_epochs = None  # low-shot variants restrict eval epochs

        self.rng = jax.random.PRNGKey(getattr(args, "seed", 42))
        self._build_datasets()
        if self.train_dataloader.is_bucketed and not self.train_dataloader.drop_last:
            # bucketed batch counts vary per epoch (trailing per-bucket
            # partials depend on that epoch's shuffle) — sum them exactly so
            # the LR schedule's decay tail lands on the true final step
            saved_epoch = self.train_dataloader.epoch
            self.max_steps = 0
            for e in range(1, self.num_epochs + 1):
                self.train_dataloader.set_epoch(e)
                self.max_steps += len(self.train_dataloader)
            self.train_dataloader.set_epoch(saved_epoch)
        else:
            self.max_steps = len(self.train_dataloader) * self.num_epochs

    # -- data ----------------------------------------------------------------
    def _build_datasets(self):
        args = self.args
        if getattr(args, "synthetic", False):
            size = getattr(args, "synthetic_train_size", 64)
            canvas = (
                getattr(args, "image_height", 384),
                getattr(args, "image_width", 640),
            )
            text_len = getattr(args, "max_text_len", 40)
            noise = getattr(args, "synthetic_noise", 0.0)
            self.train_dataset = make_synthetic_vl_dataset(
                self.task_key, self.task_cfg, "train", size, text_len, canvas, args.seed,
                label_noise=noise,
            )
            self.eval_dataset = make_synthetic_vl_dataset(
                self.task_key, self.task_cfg, "val", max(8, size // 4), text_len, canvas, args.seed,
                label_noise=noise,
            )
        else:
            from climb_tpu.data.visionlanguage import build_vl_datasets

            self.train_dataset, self.eval_dataset = build_vl_datasets(
                args, self.task_key, self.task_cfg
            )
        if self.low_shot:
            self._convert_low_shot()
        from climb_tpu.data.loader import parse_bucket_widths, parse_text_buckets

        buckets = parse_bucket_widths(
            getattr(self.args, "aspect_buckets", None),
            canvas_width=getattr(self.args, "image_width", 640),
        )
        tbuckets = parse_text_buckets(
            getattr(self.args, "text_buckets", None),
            max_text_len=getattr(self.args, "max_text_len", 40),
        )
        self.train_dataloader = DataLoader(
            self.train_dataset,
            self.batch_size,
            stack_collate,
            shuffle=True,
            seed=getattr(self.args, "seed", 42),
            num_workers=getattr(self.args, "num_workers", 2),
            worker_mode=getattr(self.args, "worker_mode", "thread"),
            bucket_widths=buckets,
            text_bucket_lens=tbuckets,
        )
        # eval is forward-only and prefers larger batches (measured: forward
        # throughput peaks well above the train batch size); --eval_batch_size
        # overrides, with the same per-task fold divisor as training
        eval_bs = getattr(self.args, "eval_batch_size", None)
        eval_bs = (
            max(1, int(eval_bs) // batch_divisor(self.task_cfg))
            if eval_bs else self.batch_size
        )
        self.eval_dataloader = DataLoader(
            self.eval_dataset, eval_bs, stack_collate, shuffle=False,
            num_workers=getattr(self.args, "num_workers", 2),
            worker_mode=getattr(self.args, "worker_mode", "thread"),
            bucket_widths=buckets,
            text_bucket_lens=tbuckets,
        )

    def _convert_low_shot(self):
        ls = self.task_cfg["low_shot_config"]
        if ls["type"] == "percentage":
            self.train_dataset = self.train_dataset.convert_to_low_shot(
                percentage=ls["percentage"], seed=getattr(self.args, "seed", 42)
            )
        else:
            self.train_dataset = self.train_dataset.convert_to_low_shot(
                num_shots_per_class=ls["num_shots_per_class"],
                seed=getattr(self.args, "seed", 42),
            )
        self.eval_epochs = ls["eval_epochs"]

    def get_train_dataloader(self):
        return self.train_dataloader

    def get_collate_fn(self):
        return stack_collate

    def _put(self, batch, mesh):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        return batch

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # -- training ------------------------------------------------------------
    def make_tx(self, model: CLModel):
        return make_optimizer(
            model.params,
            lr=self.lr,
            total_steps=self.max_steps,
            warmup_ratio=self.warmup_ratio,
            weight_decay=self.weight_decay,
            adam_epsilon=self.adam_epsilon,
            trainable_mask=model.trainable_mask,
            skip_nonfinite=int(
                getattr(self.args, "skip_nonfinite_updates", 0) or 0
            ),
            moments_dtype=getattr(self.args, "adam_moments_dtype", None),
        )

    def _make_train_step_dispatcher(self, model: CLModel):
        """The jitted train step, honoring --grad_accum_steps.

        'auto' picks the measured-fastest microbatch count PER BATCH SHAPE
        (bucketed runs see several shapes per epoch; the optimum shifts with
        sequence length — train_step.auto_grad_accum): one step fn is built
        and cached per accum value. Any accum gives the same optimizer
        trajectory (tests/test_grad_accum.py), so this is purely a schedule
        choice."""
        accum_arg = getattr(self.args, "grad_accum_steps", 1)
        make = lambda a: make_train_step(
            model.module, self.task_key, self.loss_type,
            model.cfg.compute_dtype, grad_accum_steps=a,
        )
        if str(accum_arg) not in ("auto", "sweep"):
            return make(int(accum_arg))

        steps = {}
        patch_size = model.cfg.patch_size

        if str(accum_arg) == "sweep":
            # measured, not predicted: one-time on-device sweep per
            # (batch shape, step config), cached persistently per device
            # kind (accum_tune.py) — the portable mode for chip generations
            # the 'auto' token-budget constant was not measured on
            from climb_tpu.train.accum_tune import (
                AccumTuner,
                step_config_signature,
            )

            import jax as _jax

            sharded = any(
                getattr(self.args, f, False)
                for f in ("use_mesh", "fsdp", "pp_stages")
            )
            tuner = AccumTuner(
                patch_size,
                config_sig=step_config_signature(model.cfg),
                n_devices=_jax.device_count() if sharded else 1,
            )

            # memoizing factory: the sweep's candidate steps (including the
            # winner) stay cached — no recompile of the winning accum after
            # the sweep (each jit is 1-2 min through the TPU tunnel)
            def make_cached(a):
                fn = steps.get(a)
                if fn is None:
                    fn = steps[a] = make(a)
                return fn

            def dispatch(state, batch, rng, ewc_ref=None, fd_ref=None):
                a = tuner.get(batch, ewc_ref, fd_ref)
                if a is None:
                    # time with the production refs so the measured step —
                    # and the winner's jitted arg treedef — match training
                    a = tuner.tune(make_cached, state, batch, rng,
                                   ewc_ref, fd_ref)
                return make_cached(a)(state, batch, rng, ewc_ref, fd_ref)

            return dispatch

        from climb_tpu.train.train_step import auto_grad_accum_for_batch

        token_budget = getattr(self.args, "auto_accum_token_budget", None)

        def dispatch(state, batch, rng, ewc_ref=None, fd_ref=None):
            a = auto_grad_accum_for_batch(batch, patch_size, token_budget)
            fn = steps.get(a)
            if fn is None:
                fn = steps[a] = make(a)
            return fn(state, batch, rng, ewc_ref, fd_ref)

        return dispatch

    def train(self, model: CLModel, replay_memory=None, ewc=None, distill=None):
        """Train on this task; returns (best_score, model-with-best-params)."""
        tx = self.make_tx(model)
        state = TrainState.create(
            apply_fn=model.module.apply, params=model.params, tx=tx
        )
        train_step = self._make_train_step_dispatcher(model)
        log_freq = wandb_logger.get_log_freq()
        replay_freq = getattr(self.args, "replay_frequency", 100)

        best_score, best_params = -1.0, None
        self.best_epoch = -1
        global_step = 0
        profile_dir = getattr(self.args, "profile_dir", None)
        mem_profile = getattr(self.args, "memory_profile", None)
        from climb_tpu.data.loader import device_prefetch

        # -- elastic mid-task resume (beyond-reference capability) ------------
        # With save_state_epochs > 0 and a task checkpoint dir, the FULL train
        # state (params + AdamW moments + rng + best tracking) is saved each
        # epoch and restored here, so a killed run resumes at the epoch
        # boundary with a bit-identical trajectory (loader shuffling is
        # stateless in (seed, epoch); the dropout rng chain is restored).
        import os as _os

        from climb_tpu.ckpt.checkpoint import (
            AsyncCheckpointWriter,
            load_params,
            load_train_state,
            save_params,
            save_train_state,
        )

        ckpt_dir = getattr(self.args, "task_ckpt_dir", None)
        save_every = int(getattr(self.args, "save_state_epochs", 0) or 0)
        state_path = _os.path.join(ckpt_dir, "train_state") if ckpt_dir else None
        best_path = _os.path.join(ckpt_dir, "best_model") if ckpt_dir else None
        # --async_checkpoint: elastic/best saves overlap training (the host
        # snapshot stays synchronous; serialization + disk I/O move to a
        # writer thread — ckpt/checkpoint.py::AsyncCheckpointWriter)
        awriter = (
            AsyncCheckpointWriter()
            if state_path and getattr(self.args, "async_checkpoint", False)
            else None
        )
        start_epoch, resume_skip = 1, 0
        if state_path and save_every and _os.path.exists(state_path):
            py_rng_before = py_random.getstate()
            try:
                state, meta = load_train_state(state, state_path)
                start_epoch = int(meta["epoch"]) + 1
                resume_skip = int(meta.get("steps_into_epoch", 0))
                global_step = int(meta["global_step"])
                best_score = float(meta["best_score"])
                self.best_epoch = int(meta["best_epoch"])
                self.rng = jnp.asarray(meta["rng"])
                if "py_random" in meta:  # ER buffer/replay sampling uses the
                    # python RNG — restore it so resumed trajectories with
                    # experience replay stay bit-identical too
                    py_random.setstate(pickle.loads(meta["py_random"].tobytes()))
                if self.best_epoch > 0 and _os.path.exists(best_path):
                    best_params = load_params(best_path)
                logger.info(
                    "task=%s: resuming from epoch %d (step %d, skip %d, best %.2f @ epoch %d)",
                    self.task_key, start_epoch, global_step, resume_skip,
                    best_score, self.best_epoch,
                )
            except Exception as e:
                # a corrupt/truncated elastic checkpoint (host died mid-write
                # of best_model, version skew, ...) must degrade to a fresh
                # task run, not brick the experiment
                logger.warning(
                    "task=%s: elastic state at %s unusable (%s); restarting task",
                    self.task_key, state_path, e,
                )
                start_epoch, resume_skip, global_step = 1, 0, 0
                best_score, best_params, self.best_epoch = -1.0, None, -1
                # the failure may have happened AFTER py_random.setstate ran
                # (e.g. a corrupt best_model): restore the pre-resume python
                # RNG so the restarted task's replay sampling matches a
                # genuinely fresh run
                py_random.setstate(py_rng_before)
                self.rng = jax.random.PRNGKey(getattr(self.args, "seed", 42))
                tx = self.make_tx(model)
                state = TrainState.create(
                    apply_fn=model.module.apply, params=model.params, tx=tx
                )

        # graceful preemption: SIGTERM -> save full state at the next step
        # boundary (incl. the loader position) and exit 143
        preempt = bool(state_path and save_every) and not getattr(
            self.args, "no_sigterm_checkpoint", False
        )
        if preempt:
            from climb_tpu.utils.preemption import install_preemption_handler

            preempt = install_preemption_handler()
        from climb_tpu.utils.preemption import (
            preemption_requested,
            uninstall_preemption_handler,
        )

        try:
            fd_ref = (
                distill.ref()
                if distill is not None and distill.has_teacher()
                else None
            )
            best_score, best_params = self._epoch_loop(
                model, state, train_step, replay_memory, ewc, fd_ref,
                start_epoch, resume_skip, global_step, best_score, best_params,
                log_freq, replay_freq, profile_dir, mem_profile, preempt,
                save_every, state_path, best_path, awriter,
                device_prefetch, save_params, save_train_state,
            )
        except BaseException:
            # join pending writes even on failure/preemption so files on
            # disk are complete before any reader (or retry) sees them — but
            # never let a stale writer error MASK the original exception
            # (incl. the SIGTERM SystemExit(143) the orchestrator watches for)
            if awriter is not None:
                try:
                    awriter.close()
                except Exception:
                    logger.exception("async checkpoint writer failed during "
                                     "teardown (original error propagates)")
            raise
        finally:
            # the SIGTERM handler is scoped to this train loop: leaving it
            # installed would swallow later SIGTERMs that nothing polls for
            # (e.g. a test process after an in-process driver run)
            if preempt:
                uninstall_preemption_handler()
        if awriter is not None:
            awriter.close()  # clean path: re-raises any writer error
        if state_path and _os.path.exists(state_path):
            # task completed; the task ckpt supersedes (sharded saves are dirs)
            if _os.path.isdir(state_path):
                import shutil as _shutil

                _shutil.rmtree(state_path)
            else:
                _os.remove(state_path)
        return best_score, model.with_params(best_params)

    def _epoch_loop(
        self, model, state, train_step, replay_memory, ewc, fd_ref,
        start_epoch, resume_skip, global_step, best_score, best_params,
        log_freq, replay_freq, profile_dir, mem_profile, preempt,
        save_every, state_path, best_path, awriter,
        device_prefetch, save_params, save_train_state,
    ):

        from climb_tpu.utils.preemption import preemption_requested

        _sharded_ckpt = bool(getattr(self.args, "sharded_checkpoints", False))
        for epoch in range(start_epoch, self.num_epochs + 1):
            self.train_dataloader.set_epoch(epoch)
            steps_this_epoch = 0
            if resume_skip and epoch == start_epoch:
                self.train_dataloader.set_skip(resume_skip)
                steps_this_epoch = resume_skip
                resume_skip = 0
            t0, seen = time.time(), 0
            batches = device_prefetch(
                iter(self.train_dataloader), lambda b: self._put(b, model.mesh)
            )
            for batch in batches:
                # profiler window over steady-state steps (aux subsystem:
                # the reference has no tracing at all, SURVEY.md section 5.1)
                if profile_dir is not None and global_step == 5:
                    jax.profiler.start_trace(profile_dir)
                ewc_ref = None
                if ewc is not None and ewc.has_tasks():
                    ewc_ref = ewc.sample_ref()
                state, metrics = train_step(
                    state, batch, self._next_rng(), ewc_ref, fd_ref
                )
                global_step += 1
                if profile_dir is not None and global_step == 10:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    profile_dir = None
                if mem_profile is not None and global_step == 5:
                    jax.block_until_ready(metrics["loss"])
                    try:
                        import os as _os

                        _os.makedirs(_os.path.dirname(mem_profile) or ".",
                                     exist_ok=True)
                        with open(mem_profile, "wb") as f:
                            f.write(jax.profiler.device_memory_profile())
                        logger.info("device memory profile -> %s", mem_profile)
                    except Exception:
                        logger.exception("device_memory_profile failed "
                                         "(unsupported on this backend?)")
                    mem_profile = None
                seen += self.batch_size
                if replay_memory is not None and replay_memory.do_replay():
                    if global_step % replay_freq == 0:
                        new_params = replay_memory.run_replay_step(
                            state.params, self._next_rng()
                        )
                        state = state.replace(params=new_params)
                steps_this_epoch += 1
                if global_step % log_freq == 0:
                    log = {f"{self.task_key}/loss": float(metrics["loss"])}
                    if "ewc_loss" in metrics:
                        log[f"{self.task_key}/ewc_loss"] = float(metrics["ewc_loss"])
                    if "distill_loss" in metrics:
                        log[f"{self.task_key}/distill_loss"] = float(
                            metrics["distill_loss"]
                        )
                    # epoch-to-date device throughput (the loss fetch above
                    # is the hard sync, so the window is honestly bounded)
                    log[f"{self.task_key}/examples_per_sec"] = round(
                        seen / max(time.time() - t0, 1e-9), 1
                    )
                    wandb_logger.log(log)
                if preempt and preemption_requested():
                    if awriter is not None:  # keep file ordering, then save
                        try:                 # synchronously — we exit next
                            awriter.flush()
                        except Exception:
                            # an EARLIER failed async write must not abort
                            # the at-preemption save (the one that matters)
                            logger.exception("async writer error surfaced at "
                                             "preemption; saving state anyway")
                    save_train_state(
                        state,
                        {
                            "epoch": epoch - 1,  # resume re-enters this epoch...
                            "steps_into_epoch": steps_this_epoch,  # ...skipping done steps
                            "global_step": global_step,
                            "best_score": best_score,
                            "best_epoch": self.best_epoch,
                            "rng": jax.device_get(self.rng),
                            "py_random": np.frombuffer(
                                pickle.dumps(py_random.getstate()), dtype=np.uint8
                            ),
                        },
                        state_path,
                        sharded=_sharded_ckpt,
                    )
                    logger.warning(
                        "task=%s: preempted at epoch %d step %d — train state "
                        "saved to %s; exiting 143",
                        self.task_key, epoch, steps_this_epoch, state_path,
                    )
                    from climb_tpu.utils.preemption import clear_preemption

                    clear_preemption()  # acted on: in-process callers
                    raise SystemExit(143)  # (tests) must not re-preempt
            dt = time.time() - t0
            do_eval = self.eval_epochs is None or epoch in self.eval_epochs
            if do_eval:
                score = self.eval(state.params, model)
                logger.info(
                    "task=%s epoch %d/%d: score=%.2f (%.1f ex/s)",
                    self.task_key, epoch, self.num_epochs, score, seen / max(dt, 1e-6),
                )
                wandb_logger.log({f"{self.task_key}/dev_score": score})
                if score > best_score:
                    best_score = score
                    self.best_epoch = epoch
                    best_params = jax.device_get(state.params)
                    if best_path and save_every:
                        save_params(best_params, best_path, async_writer=awriter)
            if state_path and save_every and epoch % save_every == 0:
                save_train_state(
                    state,
                    {
                        "epoch": epoch,
                        "global_step": global_step,
                        "best_score": best_score,
                        "best_epoch": self.best_epoch,
                        "rng": jax.device_get(self.rng),
                        "py_random": np.frombuffer(
                            pickle.dumps(py_random.getstate()), dtype=np.uint8
                        ),
                    },
                    state_path,
                    async_writer=awriter,
                    sharded=_sharded_ckpt,
                )

        if best_params is None:  # no eval epochs hit — keep final params
            best_params = jax.device_get(state.params)
            best_score = self.eval(state.params, model)
        return best_score, best_params

    # -- evaluation ----------------------------------------------------------
    def eval(self, params, model: CLModel) -> float:
        eval_step = make_eval_step(
            model.module, self.task_key, self.loss_type, model.cfg.compute_dtype
        )
        total, count = 0.0, 0.0
        for batch in self.eval_dataloader:
            batch = self._put(batch, model.mesh)
            _, s, c = eval_step(params, batch)
            total += float(s)
            count += float(c)
        return 100.0 * total / max(count, 1.0)

    def eval_forgetting(self, model: CLModel, model_path: str) -> float:
        """Load a later-task checkpoint and evaluate this task
        (parity: reference eval_forgetting, e.g. train_snli_ve.py:268-282)."""
        from climb_tpu.ckpt.checkpoint import load_params

        params = load_params(model_path)
        return self.eval(params, model)


class LowShotVLTaskTrainer(VLTaskTrainer):
    """Low-shot variant (parity: LowShot*Trainer classes, e.g.
    train_snli_ve.py:269-347): subsampled train set, restricted eval epochs,
    no replay/EWC hooks."""

    low_shot = True

    def train(self, model: CLModel, replay_memory=None, ewc=None, distill=None):
        if replay_memory is not None or ewc is not None or distill is not None:
            logger.warning(
                "low-shot training ignores CL algorithm hooks (reference "
                "LowShot*Trainer semantics, e.g. train_snli_ve.py:269-347)"
            )
        return super().train(model, replay_memory=None, ewc=None)


def _variant(base, key):
    return type(
        f"{key.replace('-', '_').upper()}Trainer", (base,), {"task_key": key}
    )


TRAINER_REGISTRY = {
    "vqa": _variant(VLTaskTrainer, "vqa"),
    "nlvr2": _variant(VLTaskTrainer, "nlvr2"),
    "snli-ve": _variant(VLTaskTrainer, "snli-ve"),
    "vcr": _variant(VLTaskTrainer, "vcr"),
    "low_shot_vqa": _variant(LowShotVLTaskTrainer, "vqa"),
    "low_shot_nlvr2": _variant(LowShotVLTaskTrainer, "nlvr2"),
    "low_shot_snli-ve": _variant(LowShotVLTaskTrainer, "snli-ve"),
    "low_shot_vcr": _variant(LowShotVLTaskTrainer, "vcr"),
}


def get_task_trainer_class(name: str):
    return TRAINER_REGISTRY[name]
