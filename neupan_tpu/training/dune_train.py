"""DUNE offline training on TPU — optax pipeline with exact labels.

Capability parity with the reference trainer (reference: blocks/
dune_train.py:142-300): same defaults (data_size 100k in [-25, 25]^2,
batch 256, 5000 epochs, Adam lr 5e-5 + weight decay 1e-4, lr x0.5 every
1500 epochs, validate every 100, checkpoint every 500), same 4-term MSE loss
(mu, distance, fa with a fresh random rotation per batch, fb), same
results.txt / train-dict persistence.

TPU-first differences:
  * labels come from the closed-form polygon-distance solution
    (training/labels.py) — the reference's 100k sequential ECOS solves
    collapse into one vectorized call;
  * one epoch = one jitted ``lax.scan`` over shuffled mini-batches; the
    whole epoch runs on-device, only scalar losses return to host;
  * checkpoints are numpy ``.npz`` (portable, no pickle of code objects),
    plus a JSON train dict.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neupan_tpu.models import obs_point_net
from neupan_tpu.training.labels import polygon_distance_labels


def _loss_terms(params, batch_p, batch_mu, batch_d, G, h, R):
    """The 4-term MSE loss (reference dune_train.py:302-372).

    fa = (-R G' mu)'; fb = fa p + mu' h, with one random rotation R shared
    across the batch.
    """
    out_mu = obs_point_net.forward(params, batch_p)          # (B, E)
    dist = jnp.einsum("be,be->b", out_mu, batch_p @ G.T - h.reshape(1, -1))

    mse_mu = jnp.mean((out_mu - batch_mu) ** 2)
    mse_d = jnp.mean((dist - batch_d) ** 2)

    GT = G.T                                                  # (2, E)
    fa_o = -(out_mu @ GT.T) @ R.T                              # (B, 2) = (-R G' mu)'
    fa_l = -(batch_mu @ GT.T) @ R.T
    fb_o = jnp.sum(fa_o * batch_p, axis=1) + out_mu @ h.reshape(-1)
    fb_l = jnp.sum(fa_l * batch_p, axis=1) + batch_mu @ h.reshape(-1)

    mse_fa = jnp.mean((fa_o - fa_l) ** 2)
    mse_fb = jnp.mean((fb_o - fb_l) ** 2)
    return mse_mu, mse_d, mse_fa, mse_fb


class DuneTrainer:
    """Offline trainer for one robot geometry (G, h)."""

    def __init__(self, G: np.ndarray, h: np.ndarray, checkpoint_path: str):
        # Kept as NUMPY on purpose: these are closed over by jitted epoch /
        # eval functions, and captured numpy constants become HLO literals
        # while captured device arrays would be hoisted into hidden runtime
        # arguments — which permanently degrades the axon TPU dispatch path
        # for the whole process (see planner.py:_step).
        self.G = np.asarray(G, np.float32)
        self.h = np.asarray(h, np.float32)
        self.checkpoint_path = checkpoint_path
        os.makedirs(checkpoint_path, exist_ok=True)

    # ------------------------------------------------------------------

    def generate_dataset(self, data_size: int, data_range, key) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        lo = jnp.asarray(data_range[:2], jnp.float32)
        hi = jnp.asarray(data_range[2:], jnp.float32)
        pts = jax.random.uniform(key, (data_size, 2), jnp.float32,
                                 minval=lo, maxval=hi)
        # Exact f32 matmuls are load-bearing here: on TPU the default
        # precision lowers the label solves (2x2 vertex intersections, 4x4
        # ridge systems) to bf16 passes, which injects ~1e-2 noise into the
        # mu labels — an unlearnable dataset whose MSE floor sits exactly at
        # the plateau the training then never escapes.
        with jax.default_matmul_precision("highest"):
            mu, d = polygon_distance_labels(self.G, self.h, pts)
        return pts, mu, d

    # ------------------------------------------------------------------

    def start(
        self,
        params=None,
        data_size: int = 100000,
        data_range=(-25, -25, 25, 25),
        batch_size: int = 256,
        epoch: int = 5000,
        valid_freq: int = 100,
        save_freq: int = 500,
        lr: float = 5e-5,
        lr_decay: float = 0.5,
        decay_freq: int = 1500,
        save_loss: bool = False,
        seed: int = 0,
        optimizer: str = "adam_l2",
        **_: object,
    ):
        """Run training; returns (trained params, final checkpoint path)."""
        key = jax.random.PRNGKey(seed)
        if params is None:
            key, pk = jax.random.split(key)
            params = obs_point_net.init_params(pk, 2, self.G.shape[0])

        train_dict = dict(
            data_size=data_size, data_range=list(data_range),
            batch_size=batch_size, epoch=epoch, valid_freq=valid_freq,
            save_freq=save_freq, lr=lr, lr_decay=lr_decay,
            decay_freq=decay_freq,
            robot_G=np.asarray(self.G).tolist(),
            robot_h=np.asarray(self.h).tolist(),
        )
        with open(os.path.join(self.checkpoint_path, "train_dict.json"), "w") as f:
            json.dump(train_dict, f, indent=2)
        self._log(f"train config: {train_dict}")

        key, dk = jax.random.split(key)
        t0 = time.time()
        pts, mu, dist = self.generate_dataset(data_size, data_range, dk)
        n_train = int(data_size * 0.8)
        train = (pts[:n_train], mu[:n_train], dist[:n_train])
        valid = (pts[n_train:], mu[n_train:], dist[n_train:])
        self._log(f"dataset ({data_size} pts) labeled in {time.time()-t0:.2f}s")

        # lr schedule: step decay every decay_freq epochs
        n_batches = max(n_train // batch_size, 1)
        sched = optax.exponential_decay(
            lr, transition_steps=decay_freq * n_batches,
            decay_rate=lr_decay, staircase=True)
        if optimizer == "adam_l2":
            # torch-style Adam with COUPLED L2 (the reference's optimizer,
            # dune_train.py:74): decay enters the gradient before the Adam
            # moments, so its effective step scales with 1/sqrt(v) like the
            # loss gradient does.  This is the default because it is the
            # only recipe measured to escape the constant-function plateau
            # reliably: the 4-term loss has a strong local minimum at
            # "output = per-component label mean" (loss ~= label variance),
            # and decoupled AdamW got permanently stuck there on some seeds
            # while adam_l2 escaped on every seed tried (matrix experiment,
            # round 2).
            tx = optax.chain(optax.add_decayed_weights(1e-4),
                             optax.scale_by_adam(),
                             optax.scale_by_learning_rate(sched))
        else:
            tx = optax.adamw(sched, weight_decay=1e-4)
        opt_state = tx.init(params)

        G, h = self.G, self.h

        def epoch_step(params, opt_state, key, data):
            # The 2->32->...->E MLP is tiny; bf16 MXU passes save nothing
            # here but add gradient noise at the loss scale the model must
            # reach (~1e-5) — force exact f32 throughout the update.
            with jax.default_matmul_precision("highest"):
                return _epoch_step(params, opt_state, key, data)

        def _epoch_step(params, opt_state, key, data):
            p_all, mu_all, d_all = data
            n = p_all.shape[0]
            key, sk, rk = jax.random.split(key, 3)
            perm = jax.random.permutation(sk, n)[: n_batches * batch_size]
            pb = p_all[perm].reshape(n_batches, batch_size, 2)
            mb = mu_all[perm].reshape(n_batches, batch_size, -1)
            db = d_all[perm].reshape(n_batches, batch_size)
            thetas = jax.random.uniform(rk, (n_batches,), maxval=2 * jnp.pi)

            def body(carry, xs):
                params, opt_state = carry
                bp, bmu, bd, theta = xs
                c, s = jnp.cos(theta), jnp.sin(theta)
                R = jnp.array([[c, -s], [s, c]])

                def loss_fn(p):
                    terms = _loss_terms(p, bp, bmu, bd, G, h, R)
                    return sum(terms), terms

                (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), jnp.stack(terms)

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (pb, mb, db, thetas))
            return params, opt_state, jnp.mean(losses, axis=0)

        epoch_step = jax.jit(epoch_step)

        def eval_losses(params, data, key):
            p_all, mu_all, d_all = data
            theta = jax.random.uniform(key, (), maxval=2 * jnp.pi)
            c, s = jnp.cos(theta), jnp.sin(theta)
            R = jnp.array([[c, -s], [s, c]])
            with jax.default_matmul_precision("highest"):
                return jnp.stack(
                    _loss_terms(params, p_all, mu_all, d_all, G, h, R))

        eval_losses = jax.jit(eval_losses)

        # progress display parity with the reference's rich Live/Progress
        # (reference dune_train.py:77-79): a live bar + latest losses when
        # stdout is a terminal; plain results.txt logging always happens.
        progress = None
        task = None
        try:
            import sys as _sys

            if _sys.stdout.isatty():
                from rich.progress import (BarColumn, Progress, TextColumn,
                                           TimeRemainingColumn)

                progress = Progress(
                    TextColumn("[bold]DUNE[/bold]"), BarColumn(),
                    TextColumn("{task.completed}/{task.total}"),
                    TimeRemainingColumn(),
                    TextColumn("{task.fields[losses]}"))
                task = progress.add_task("train", total=epoch + 1,
                                         losses="")
                progress.start()
        except Exception:
            progress = None

        full_model_name = None
        loss_list = []
        try:
            for i in range(epoch + 1):
                key, ek, vk = jax.random.split(key, 3)
                params, opt_state, tr = epoch_step(params, opt_state, ek,
                                                   train)
                tr = np.asarray(tr)

                if i % valid_freq == 0:
                    va = np.asarray(eval_losses(params, valid, vk))
                    cur_lr = float(sched(i * n_batches))
                    self._log(
                        f"Epoch {i}/{epoch} lr {cur_lr:.2e} | "
                        f"mu {tr[0]:.2e}/{va[0]:.2e} "
                        f"dist {tr[1]:.2e}/{va[1]:.2e} "
                        f"fa {tr[2]:.2e}/{va[2]:.2e} fb {tr[3]:.2e}/{va[3]:.2e}",
                        console=progress is None)

                if i % save_freq == 0:
                    full_model_name = os.path.join(
                        self.checkpoint_path, f"model_{i}.npz")
                    obs_point_net.save_checkpoint(full_model_name, params)

                loss_list.append(float(tr.sum()))
                if save_loss:
                    np.save(os.path.join(self.checkpoint_path, "loss.npy"),
                            np.asarray(loss_list))
                if progress is not None:
                    progress.update(task, advance=1,
                                    losses=f"mu {tr[0]:.1e} d {tr[1]:.1e} "
                                           f"fa {tr[2]:.1e} fb {tr[3]:.1e}")
        finally:
            if progress is not None:
                progress.stop()

        return params, full_model_name

    # ------------------------------------------------------------------

    def test(self, params, data_size_list=(1000,), data_range=(-25, -25, 25, 25),
             seed: int = 1):
        """Accuracy + latency harness (reference dune_train.py:435-528)."""
        key = jax.random.PRNGKey(seed)
        results = []
        fwd = jax.jit(obs_point_net.forward)
        for ds in data_size_list:
            key, dk, rk = jax.random.split(key, 3)
            pts, mu, dist = self.generate_dataset(ds, data_range, dk)
            # warmup + timing, averaged over a CHAINED loop with a single
            # terminal device->host read (the reference harness it mirrors
            # averages too, reference dune_train.py:511-513).  Each call's
            # input depends on the previous call's output so calls cannot
            # overlap or be elided, and the terminal read forces the true
            # queue drain — on the axon TPU tunnel `block_until_ready`
            # returns at enqueue-ACK and unchained identical calls can
            # dedup/overlap (docs/AXON_DISPATCH.md, advisor round-4).
            n_timing = 10
            out = fwd(params, pts)
            _ = np.asarray(out[0, 0])  # warmup incl. drain
            t0 = time.time()
            cur = pts
            for _ in range(n_timing):
                out = fwd(params, cur)
                cur = pts + 1e-30 * out[:, :2]
            _ = np.asarray(out[0, 0])  # terminal read: true completion
            dt = (time.time() - t0) / n_timing
            losses = np.asarray(
                jax.jit(eval_fn := (lambda p, a, b, c, k:
                        jnp.stack(_loss_terms(p, a, b, c, self.G, self.h,
                                              jnp.eye(2)))))(params, pts, mu, dist, rk))
            results.append(dict(data_size=ds, inference_time=dt,
                                mu_loss=float(losses[0]),
                                distance_loss=float(losses[1]),
                                fa_loss=float(losses[2]),
                                fb_loss=float(losses[3])))
            with open(os.path.join(self.checkpoint_path, "test_results.txt"), "a") as f:
                print(results[-1], file=f)
        return results

    def _log(self, msg: str, console: bool = True):
        if console:
            print(msg)
        with open(os.path.join(self.checkpoint_path, "results.txt"), "a") as f:
            print(msg, file=f)
