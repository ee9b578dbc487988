"""LON — learning of navigation: online tuning of the adjust parameters.

Parity with the reference's LON examples (reference: example/LON/
LON_corridor.py): closed-loop episodes differentiate an episode loss through
the QP layer into the adjustable weights (q_s, p_u, eta, d_max, d_min).

Our QP solver carries a custom VJP (implicit differentiation of the
active-set KKT system, ops/qp.py), so ``jax.grad`` of any scalar loss built
from the planner-step outputs w.r.t. ``AdjustParams`` works directly — this
module packages the common pieces:

  * ``distance_loss`` — the reference's per-step loss shape
    (LON_corridor.py:10-19): 50 - sum(d) near collision, 50 + sum(d) when
    stuck, else 0; scaled by 10.
  * ``step_loss_and_grad`` — one planner step -> (loss, grads wrt adjust);
  * ``LONTuner`` — optax-based parameter updates with per-leaf masking
    (the reference optimizes [p_u, eta, d_max] by default).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from neupan_tpu.ops.nrmp import AdjustParams
from neupan_tpu.ops.pan import PANSpec, PANState, pan_forward


def distance_loss(opt_d: jnp.ndarray, min_distance: jnp.ndarray,
                  collision_threshold: float = 0.3,
                  stuck: bool | jnp.ndarray = False) -> jnp.ndarray:
    """Reference LON loss: penalize near-collision / stuck episodes."""
    near = min_distance < collision_threshold
    base = jnp.where(near, 50.0 - jnp.sum(opt_d),
                     jnp.where(stuck, 50.0 + jnp.sum(opt_d), 0.0))
    return 10.0 * base


def tracking_losses(out, ref_s: jnp.ndarray, ref_us: jnp.ndarray):
    """State/speed MSE losses of the LON_corridor_02 variant (reference:
    example/LON/LON_corridor_02.py cal_loss): MSE(opt_s, ref_s) and
    MSE(opt_u[0, :], ref_us)."""
    state_loss = jnp.mean((out.opt_s - ref_s) ** 2)
    speed_loss = jnp.mean((out.opt_u[0, :] - ref_us) ** 2)
    return state_loss, speed_loss


# One jitted value-and-grad per (spec, loss_fn, threshold).  Without this
# cache every call re-traced a fresh closure through eager AD: each of the
# episode's ~120 steps leaked trace/executable memory (~14 MB/s observed)
# until LLVM's JIT could no longer allocate and the process segfaulted at
# the next epoch.  Callers should pass a STABLE loss_fn (module-level
# function, not a per-step closure) to hit the cache; the dict is a true
# LRU (hits refresh recency) so per-call closure churn cannot evict the
# stable entries the cache exists to protect.
from collections import OrderedDict

_LOSS_GRAD_CACHE: "OrderedDict" = OrderedDict()
_LOSS_GRAD_CACHE_MAX = 32


def _loss_fn_arity(loss_fn) -> int:
    """Arity contract: 1 (loss_fn(out)) or 4 (loss_fn(out, ref_s, ref_us,
    stuck)).  Anything else is an error — silently calling a 2/3-parameter
    function with 4 positional args would raise at trace time, and a
    signature-inspection failure must not silently drop ref_s/ref_us/stuck
    (advisor round-2 finding)."""
    import inspect

    try:
        params = inspect.signature(loss_fn).parameters
    except (TypeError, ValueError) as e:
        raise TypeError(
            "loss_fn signature could not be inspected; wrap it in a plain "
            "def taking either (out) or (out, ref_s, ref_us, stuck)"
        ) from e
    # *args / **kwargs make the parameter COUNT meaningless — a loss_fn
    # declared as (*args) would count as 1 and be silently called as
    # loss_fn(out), dropping ref_s/ref_us/stuck: the exact silent-drop
    # failure this check exists to prevent (advisor round-3 finding).
    for p in params.values():
        if p.kind in (inspect.Parameter.VAR_POSITIONAL,
                      inspect.Parameter.VAR_KEYWORD):
            raise ValueError(
                "loss_fn must declare explicit positional parameters — "
                "either (out) or (out, ref_s, ref_us, stuck); *args/"
                "**kwargs signatures are ambiguous and rejected")
    n_params = len(params)
    if n_params not in (1, 4):
        raise ValueError(
            f"loss_fn must take exactly 1 argument (out) or 4 arguments "
            f"(out, ref_s, ref_us, stuck); got {n_params}")
    return n_params


def _get_loss_grad_fn(spec: PANSpec, loss_fn, collision_threshold: float):
    key = (spec, loss_fn, float(collision_threshold))
    fn = _LOSS_GRAD_CACHE.get(key)
    if fn is not None:
        _LOSS_GRAD_CACHE.move_to_end(key)
        return fn

    n_params = 1 if loss_fn is None else _loss_fn_arity(loss_fn)

    def wrapped(adj, dune_params, G, h, nom_s, nom_u, ref_s, ref_us,
                points, velocities, mask, state, stuck):
        out = pan_forward(spec, dune_params, G, h, adj,
                          nom_s, nom_u, ref_s, ref_us,
                          points, velocities, mask, state)
        if loss_fn is None:
            loss = distance_loss(out.opt_d, out.min_distance,
                                 collision_threshold, stuck)
        elif n_params == 1:
            loss = loss_fn(out)
        else:
            loss = loss_fn(out, ref_s, ref_us, stuck)
        return loss, out

    fn = jax.jit(jax.value_and_grad(wrapped, has_aux=True))
    if len(_LOSS_GRAD_CACHE) >= _LOSS_GRAD_CACHE_MAX:
        _LOSS_GRAD_CACHE.popitem(last=False)  # evict least-recently-used
    _LOSS_GRAD_CACHE[key] = fn
    return fn


def step_loss_and_grad(spec: PANSpec, dune_params, G, h,
                       adjust: AdjustParams,
                       nom_s, nom_u, ref_s, ref_us,
                       points, velocities, mask, state: PANState,
                       loss_fn: Optional[Callable] = None,
                       collision_threshold: float = 0.3,
                       stuck=False):
    """Differentiate one planner step's loss w.r.t. the adjust parameters.

    The underlying value-and-grad is jitted and cached per (spec, loss_fn,
    collision_threshold); ``stuck`` is traced, so flipping it does not
    recompile.  Pass a stable (module-level) ``loss_fn`` to reuse the cache
    across steps.
    """
    fn = _get_loss_grad_fn(spec, loss_fn, collision_threshold)
    (loss, out), grads = fn(adjust, dune_params, G, h, nom_s, nom_u,
                            ref_s, ref_us, points, velocities, mask, state,
                            jnp.asarray(stuck, bool))
    return loss, grads, out


class LONTuner:
    """Adam updates on a masked subset of AdjustParams leaves."""

    def __init__(self, adjust: AdjustParams, lr: float = 5e-3,
                 train_fields: Sequence[str] = ("p_u", "eta", "d_max")):
        self.train_fields = tuple(train_fields)
        labels = AdjustParams(*["train" if f in self.train_fields else "freeze"
                                for f in AdjustParams._fields])
        self.tx = optax.multi_transform(
            {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels)
        self.opt_state = self.tx.init(adjust)

    def update(self, adjust: AdjustParams, grads: AdjustParams) -> AdjustParams:
        updates, self.opt_state = self.tx.update(grads, self.opt_state, adjust)
        new = optax.apply_updates(adjust, updates)
        # keep distances meaningful
        return new._replace(
            d_max=jnp.maximum(new.d_max, 1e-3),
            d_min=jnp.maximum(new.d_min, 0.0),
            eta=jnp.maximum(new.eta, 0.0),
        )
