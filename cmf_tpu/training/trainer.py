"""Training engine.

Contract: reference cmf/trainer.py (ignite-based) rebuilt as a plain epoch
loop around jit-compiled functional train steps:

* per-epoch objective flags from ``objectives.py`` — static flags select one
  of a small number of compiled step variants, continuous weights are traced
  (no recompilation during warmup interpolation);
* optimizer selection by ``epoch % num_optimizers`` (trainer.py:208) with the
  m-flow pre-introduction skip (trainer.py:196-201);
* validation at epoch end gated by ``early_stopping_start_epoch`` and
  ``valid_frequency`` (trainer.py:292-327), FID-as-validation-loss when a fid
  function exists (trainer.py:300-302), manual best/bad-epoch bookkeeping and
  termination;
* test every ``epochs_per_test`` epochs, off-by-one preserved: tests after
  epoch 1 (trainer.py:263-272); NaN-tagged checkpoints;
* telemetry every 10 steps: train metrics, global grad norm, lr
  (trainer.py:334-355);
* checkpoint auto-restore at startup, best_valid/latest order depending on
  testing mode (trainer.py:175-186).

The train step donates params/opt-state buffers and constrains the batch to
the data mesh axis when a sharding is provided — the TPU replacement for
``nn.DataParallel`` scatter.
"""

import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .checkpoint import make_checkpoint, restore_arrays
from ..densities import PassthroughBeforeEvalDensity

_STEPS_PER_LOSS_WRITE = 10
_STEPS_PER_GRAD_WRITE = 10
_STEPS_PER_LR_WRITE = 10


class EarlyStop(Exception):
    pass


class Trainer:
    def __init__(
        self,
        density,
        variables,
        objective,
        optimizers,          # list of optax GradientTransformation
        lr_schedules,        # list of callables step -> lr (for logging)
        train_loader,
        valid_loader,
        test_loader,
        writer,
        visualizer,
        max_epochs,
        early_stopping,
        max_bad_valid_epochs,
        valid_frequency,
        epochs_per_test,
        valid_loss_fn=None,  # (density, variables, x, rng) -> (B,) losses
        test_metrics_fn=None,  # (density, variables, x, rng) -> dict of (B,) arrays
        fid_function=None,   # (density, variables, rng) -> float
        should_checkpoint_latest=True,
        should_checkpoint_best_valid=True,
        only_testing=False,
        rng=None,
        batch_sharding=None,
        profile_dir=None,
    ):
        self.density = density
        self.params = variables["params"]
        self.model_state = variables["state"]
        self.objective = objective
        self.optimizers = optimizers
        self.lr_schedules = lr_schedules
        self.opt_states = [opt.init(self.params) for opt in optimizers]
        self.num_optimizers = len(optimizers)

        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.test_loader = test_loader
        self.writer = writer
        self.visualizer = visualizer

        self.max_epochs = max_epochs
        self.early_stopping = early_stopping
        self.early_stopping_start_epoch = objective.early_stopping_start_epoch
        self.max_bad_valid_epochs = max_bad_valid_epochs
        self.valid_frequency = valid_frequency
        self.epochs_per_test = epochs_per_test

        self.valid_loss_fn = valid_loss_fn
        self.test_metrics_fn = test_metrics_fn
        self.fid_function = fid_function

        self.should_checkpoint_latest = should_checkpoint_latest
        self.should_checkpoint_best_valid = should_checkpoint_best_valid

        self.best_valid_loss = float("inf")
        self.num_bad_valid_epochs = 0
        self.epoch = 0
        self.iteration = 0
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.batch_sharding = batch_sharding

        self._step_cache = {}
        self._eval_cache = {}
        # jax.profiler trace of the first post-compile epoch (§5 tracing):
        # written as a TensorBoard-compatible trace under profile_dir.
        self.profile_dir = profile_dir
        self._profiled = False

        # Startup auto-restore (trainer.py:175-186)
        first, second = ("best_valid", "latest") if only_testing else ("latest", "best_valid")
        for tag in (first, second):
            try:
                self._load_checkpoint(tag)
                break
            except FileNotFoundError:
                print(f"Did not find `{tag}' checkpoint.", file=sys.stderr)

    # ------------------------------------------------------------ train step
    def _make_loss_step(self, opt_index, flags):
        """carry=(params, model_state, opt_state, rng); one optimizer step."""
        opt = self.optimizers[opt_index]
        density = self.density
        skip_likelihood = flags["skip_likelihood"]
        add_recon = flags["add_reconstruction"]
        g_kk = flags["add_diagonal_metric_reg"]
        g_ij = flags["add_offdiagonal_metric_reg"]

        def step(carry, x, likelihood_wt, metric_wt):
            params, model_state, opt_state, rng = carry
            rng, step_rng = jax.random.split(rng)

            def loss_fn(p):
                info, new_state = density.elbo(
                    {"params": p, "state": model_state},
                    x,
                    rng=step_rng,
                    train=True,
                    likelihood_wt=likelihood_wt,
                    metric_wt=metric_wt,
                    add_reconstruction=add_recon,
                    add_diagonal_metric_reg=g_kk,
                    add_offdiagonal_metric_reg=g_ij,
                    skip_likelihood=skip_likelihood,
                )
                return -jnp.mean(info["elbo"]), new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grad_norm = optax.global_norm(grads)
            updates, new_opt_state = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # Freeze the carry on the first non-finite loss/grad: the scanned
            # epoch must not let NaNs infect the donated params, so the
            # post-epoch FloatingPointError (and its `nan_during_training'
            # checkpoint) still holds the last finite state — the functional
            # counterpart of the reference's per-step TerminateOnNan
            # (cmf/trainer.py:139).
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

            def _keep(new, old):
                return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

            params = _keep(new_params, params)
            opt_state = _keep(new_opt_state, opt_state)
            model_state = _keep(new_state, model_state)
            return (params, model_state, opt_state, rng), (loss, grad_norm)

        return step

    def _flag_key(self, opt_index, flags):
        return (
            opt_index,
            flags["skip_likelihood"],
            flags["add_reconstruction"],
            flags["add_diagonal_metric_reg"],
            flags["add_offdiagonal_metric_reg"],
        )

    def _get_step(self, opt_index, flags):
        key = self._flag_key(opt_index, flags)
        if key not in self._step_cache:
            inner = self._make_loss_step(opt_index, flags)

            @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def step(params, model_state, opt_state, rng, x, likelihood_wt, metric_wt):
                carry, (loss, grad_norm) = inner(
                    (params, model_state, opt_state, rng), x, likelihood_wt, metric_wt
                )
                return carry + (loss, grad_norm)

            self._step_cache[key] = step
        return self._step_cache[key]

    def _get_epoch_fn(self, opt_index, flags):
        """Whole-epoch ``lax.scan`` over the stacked batch array: ONE dispatch
        per epoch — dispatch/PRNG host latency leaves the hot path entirely
        (the TPU-native replacement for the reference's per-batch ignite
        engine loop)."""
        key = ("epoch",) + self._flag_key(opt_index, flags)
        if key not in self._step_cache:
            inner = self._make_loss_step(opt_index, flags)

            @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def epoch_fn(params, model_state, opt_state, rng, batches, likelihood_wt, metric_wt):
                def body(carry, x):
                    return inner(carry, x, likelihood_wt, metric_wt)

                carry, (losses, grad_norms) = jax.lax.scan(
                    body, (params, model_state, opt_state, rng), batches
                )
                return carry + (losses, grad_norms)

            self._step_cache[key] = epoch_fn
        return self._step_cache[key]

    def _place(self, x):
        if self.batch_sharding is not None and x.shape[0] % self.batch_sharding.mesh.size == 0:
            return jax.device_put(x, self.batch_sharding)
        return x

    # ------------------------------------------------------------ main loop
    def train(self):
        try:
            while self.epoch < self.max_epochs:
                self.epoch += 1
                self._train_epoch(self.epoch)
                if self.early_stopping:
                    self._validate(self.epoch)
                self._test_and_log(self.epoch)
                if self.should_checkpoint_latest:
                    self._save_checkpoint("latest")
        except EarlyStop:
            pass

    def _train_epoch(self, epoch):
        flags = self.objective.for_epoch(epoch)
        if flags["skip_epoch"]:
            return
        opt_index = flags["optimizer_index"]
        lw = jnp.asarray(flags["likelihood_wt"], jnp.float32)
        mw = jnp.asarray(flags["metric_wt"], jnp.float32)

        batches = self.train_loader.epoch_batches()
        num_batches = batches.shape[0]
        epoch_fn = self._get_epoch_fn(opt_index, flags)

        # Trace the first post-compile epoch (epoch 2) so the timeline shows
        # steady-state device time, not compilation.
        profiling = self.profile_dir is not None and not self._profiled and epoch > 1
        if profiling:
            jax.profiler.start_trace(self.profile_dir)
        (
            self.params,
            self.model_state,
            self.opt_states[opt_index],
            self.rng,
            losses,
            grad_norms,
        ) = epoch_fn(
            self.params,
            self.model_state,
            self.opt_states[opt_index],
            self.rng,
            batches,
            lw,
            mw,
        )

        if profiling:
            jax.block_until_ready(losses)
            jax.profiler.stop_trace()
            self._profiled = True

        # Telemetry: keep the reference's every-10-steps scalar cadence by
        # writing from the scanned per-step outputs (trainer.py:334-355).
        losses = np.asarray(losses)
        grad_norms = np.asarray(grad_norms)
        for j in range(num_batches):
            i = self.iteration + j + 1
            if i % _STEPS_PER_LOSS_WRITE == 0:
                self.writer.write_scalar("train/loss", float(losses[j]), global_step=i)
            if i % _STEPS_PER_GRAD_WRITE == 0:
                self.writer.write_scalar("train/grad-norm", float(grad_norms[j]), global_step=i)
            if i % _STEPS_PER_LR_WRITE == 0:
                self.writer.write_scalar(
                    "train/lr", float(self.lr_schedules[opt_index](i)), global_step=i
                )
        self.iteration += num_batches
        if not np.all(np.isfinite(losses)):
            # The scan carry froze on the first bad step, so params here are
            # the last finite state — checkpoint them for post-mortems
            # (reference trainer.py:270,316-317 tagging).
            self._save_checkpoint("nan_during_training")
            raise FloatingPointError(f"NaN/Inf loss during epoch {epoch}")

    # ------------------------------------------------------------ evaluation
    def _variables(self):
        return {"params": self.params, "state": self.model_state}

    def _eval_variables(self):
        """Refresh momentum-1 batch-norm stats through the passthrough wrapper
        before evaluation (wrapper.py:33-49 semantics, functional form)."""
        variables = self._variables()
        if isinstance(self.density, PassthroughBeforeEvalDensity):
            self.rng, refresh_rng = jax.random.split(self.rng)
            state = self.density.refresh_state(variables, rng=refresh_rng)
            variables = {"params": self.params, "state": state}
        return variables

    def _jit_eval(self, fn, name):
        if name not in self._eval_cache:
            self._eval_cache[name] = jax.jit(
                lambda variables, x, rng: fn(self.density, variables, x, rng)
            )
        return self._eval_cache[name]

    def _jit_eval_sums(self, fn, name):
        """Per-batch (sum, count) pairs computed INSIDE jit: with a sharded
        batch GSPMD inserts the cross-device reduction (psum over the data
        axis), so eval scales past one chip — the distributed replacement for
        the reference's single-process numpy buffers (SURVEY §2.18)."""
        key = name + "/sums"
        if key not in self._eval_cache:

            @jax.jit
            def jfn(variables, x, rng):
                out = fn(self.density, variables, x, rng)
                return {
                    k: (jnp.sum(v), jnp.asarray(v.size, jnp.int32))
                    for k, v in out.items()
                }

            self._eval_cache[key] = jfn
        return self._eval_cache[key]

    def _run_eval(self, fn, name, loader):
        """Average fn's per-example outputs over a loader. Accumulation stays
        on device (one host transfer per key at the end, not per batch)."""
        jfn = self._jit_eval_sums(fn, name)
        variables = self._eval_variables()
        acc = {}
        for x in loader:
            self.rng, eval_rng = jax.random.split(self.rng)
            out = jfn(variables, self._place(x), eval_rng)
            for k, sc in out.items():
                acc.setdefault(k, []).append(sc)
        return {
            k: float(jnp.sum(jnp.stack([s for s, _ in v])))
            / float(jnp.sum(jnp.stack([c for _, c in v])))
            for k, v in acc.items()
        }

    def _validate(self, epoch):
        if epoch < self.early_stopping_start_epoch:
            return
        if epoch % self.valid_frequency != 0:
            return

        if self.fid_function is not None:
            # FID substitutes for validation loss when available
            # (trainer.py:300-302)
            self.rng, fid_rng = jax.random.split(self.rng)
            valid_loss = float(self.fid_function(self.density, self._eval_variables(), fid_rng))
        else:
            out = self._run_eval(
                lambda d, v, x, r: {"loss": self.valid_loss_fn(d, v, x, r)},
                "valid",
                self.valid_loader,
            )
            valid_loss = out["loss"]

        self.writer.write_scalar("valid/loss", valid_loss, global_step=epoch)

        if valid_loss < self.best_valid_loss:
            print(f"Best validation loss {valid_loss} after epoch {epoch}")
            self.num_bad_valid_epochs = 0
            self.best_valid_loss = valid_loss
            if self.should_checkpoint_best_valid:
                self._save_checkpoint("best_valid")
        else:
            if not np.isfinite(valid_loss):
                self._save_checkpoint("nan_during_validation")
            self.num_bad_valid_epochs += 1
            if self.num_bad_valid_epochs > self.max_bad_valid_epochs:
                print(
                    f"No validation improvement after {self.num_bad_valid_epochs} epochs. Terminating."
                )
                raise EarlyStop

    def test(self):
        """Full test pass; merges FID when available (trainer.py:226-261)."""
        results = {}
        if self.test_metrics_fn is not None:
            results.update(
                self._run_eval(self.test_metrics_fn, "test", self.test_loader)
            )
        if self.fid_function is not None:
            self.rng, fid_rng = jax.random.split(self.rng)
            results["fid"] = float(
                self.fid_function(self.density, self._eval_variables(), fid_rng)
            )
            # Which extractor produced this FID (inception-jax / torchvision /
            # proxy / raw-features) — recorded into metrics.json so proxy
            # numbers can never masquerade as published-comparable FID.
            results["feature_extractor"] = getattr(
                self.fid_function, "feature_extractor", "unknown"
            )
            # sqrtm jitter the Fréchet computation needed (0.0 = none):
            # escalated jitter perturbs the score by O(jitter·d), so record
            # it alongside the number (round-4 advisor finding).
            jitter = getattr(self.fid_function, "last_jitter", None)
            if jitter:
                results["fid_sqrtm_jitter"] = float(jitter)
        return results

    def test_ood(self, loader, write_tag):
        """OOD buffering pass: per-example features to a .npy dump
        (trainer.py:229-252)."""
        jfn = self._jit_eval(
            lambda d, v, x, r: d.ood(v, x, rng=r), "ood"
        )
        variables = self._eval_variables()
        buffers = {}
        for x in loader:
            self.rng, eval_rng = jax.random.split(self.rng)
            out = jfn(variables, self._place(x), eval_rng)
            for k, v in out.items():
                buffers.setdefault(k, []).append(np.asarray(v))
        likelihoods = np.concatenate(buffers["likelihood"])
        recon = np.concatenate(buffers["reconstruction-error"])
        arr = np.stack([likelihoods, recon], axis=1)
        self.writer.write_numpy(write_tag, arr)
        return arr

    def _test_and_log(self, epoch):
        if (epoch - 1) % self.epochs_per_test != 0:
            return
        for k, v in self.test().items():
            if isinstance(v, str):  # provenance stamps are not scalars
                self.writer.write_textfile(f"test_{k}", v)
                continue
            self.writer.write_scalar(f"test/{k}", v, global_step=epoch)
            if not np.isfinite(v):
                self._save_checkpoint("nan_during_test")
        if self.visualizer is not None:
            self.visualizer.visualize(self.density, self._eval_variables(), epoch)

    # ---------------------------------------------------------- checkpoints
    def _save_checkpoint(self, tag):
        self.writer.write_checkpoint(
            tag,
            make_checkpoint(
                self.epoch,
                self.iteration,
                self.params,
                self.model_state,
                self.opt_states,
                self.best_valid_loss,
                self.num_bad_valid_epochs,
                self.rng,
            ),
        )

    def _load_checkpoint(self, tag):
        ckpt = self.writer.load_checkpoint(tag)
        self.epoch = ckpt["epoch"]
        self.iteration = ckpt["iteration"]
        self.params = restore_arrays(ckpt["params"])
        self.model_state = restore_arrays(ckpt["model_state"])
        self.opt_states = restore_arrays(ckpt["opt_states"])
        self.best_valid_loss = ckpt["best_valid_loss"]
        self.num_bad_valid_epochs = ckpt["num_bad_valid_epochs"]
        self.rng = jnp.asarray(ckpt["rng"])
        print(f"Loaded checkpoint `{tag}' after epoch {ckpt['epoch']}", file=sys.stderr)
