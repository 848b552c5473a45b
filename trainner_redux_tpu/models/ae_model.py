"""AEModel: autoencoder trainer (encoder/decoder pretraining for SR).

Parity: /root/reference/traiNNer/models/ae_model.py:31-526 — builds
network_ae, trains reconstruction (decode(encode(gt)) vs gt) with the
standard loss suite, EMA, and freeze masks for either half; validation
reports metrics of the reconstruction. One jitted step like SRModel.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from trainner_redux_tpu.archs import build_network_cast
from trainner_redux_tpu.losses import IterativeLossWrapper, build_loss, loss_log_key
from trainner_redux_tpu.models.base_model import BaseModel
from trainner_redux_tpu.models.sr_model import SRModel, TrainState
from trainner_redux_tpu.optimizers import build_optimizer
from trainner_redux_tpu.utils.redux_options import ReduxOptions
from trainner_redux_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class AEModel(SRModel):
    def __init__(self, opt: ReduxOptions) -> None:
        assert opt.network_ae is not None, "AEModel requires network_ae"
        # present the autoencoder as net_g to reuse the SRModel machinery
        opt.network_g = dict(opt.network_ae)
        self._freeze_encoder = bool(opt.network_ae.get("freeze_encoder", False))
        self._freeze_decoder = bool(opt.network_ae.get("freeze_decoder", False))
        BaseModel.__init__(self, opt)
        self.scale = opt.scale
        self.net_g = build_network_cast(
            {**opt.network_ae, "scale": opt.scale}, self.compute_dtype
        )
        self.net_d = None
        self.accum_iter = 1
        self.ema_decay = 0.0
        self.losses: list[tuple[str, Any, str]] = []
        self._train_step = None
        self._apply_cache: dict[tuple, Any] = {}

        init_key = jax.random.key(opt.manual_seed or 0)
        # AE consumes GT-resolution input (encode downsamples by scale)
        s = 16 * opt.scale
        sample = jnp.zeros((1, s, s, 3), jnp.float32)
        variables = jax.jit(lambda k, x: self.net_g.init(k, x, train=False))(
            init_key, sample
        )
        params = variables["params"]
        self.logger.info(
            f"AutoEncoder created, {self.param_count(params):,d} params "
            f"(freeze_encoder={self._freeze_encoder}, freeze_decoder={self._freeze_decoder})."
        )

        if opt.path.pretrain_network_ae:
            params = self.load_network(
                params, opt.path.pretrain_network_ae, strict=True
            )

        if self.is_train:
            self._init_training(params)
        else:
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params_g=self.replicate(params),
                opt_state_g=None,
            )
        self.lq = None
        self.gt = None
        self.output = None

    def _freeze_mask(self, grads):
        """Zero gradients of frozen halves (requires_grad=False equivalent)."""
        if not (self._freeze_encoder or self._freeze_decoder):
            return grads

        def mask(path_grads, name):
            return jax.tree.map(jnp.zeros_like, path_grads)

        grads = dict(grads)
        if self._freeze_encoder and "encoder" in grads:
            grads["encoder"] = mask(grads["encoder"], "encoder")
        if self._freeze_decoder and "decoder" in grads:
            grads["decoder"] = mask(grads["decoder"], "decoder")
        return grads

    def _build_train_step(self):
        tx_g = self.tx_g
        ema_decay = self.ema_decay
        ema_after = self.ema_update_after_step
        ema_power = self.ema_power
        ema_switch = int((self.opt.train.ema_switch_iter if self.opt.train else 0) or 0)

        def ema_update(ema, params, step):
            t = jnp.maximum(step - ema_after, 0).astype(jnp.float32)
            d = jnp.minimum(ema_decay, 1.0 - jnp.power(1.0 + t, -ema_power))
            d = jnp.where(step <= ema_after, 0.0, d)
            return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)

        def loss_fn(params, gt, cur_iter, key):
            latent = self.net_g.apply(
                {"params": params}, gt, method="encode", rngs={"dropout": key}
            )
            recon = self.net_g.apply({"params": params}, latent, method="decode")
            logs: dict[str, jnp.ndarray] = {}
            total = jnp.zeros((), jnp.float32)
            for log_key, loss, kind in self.losses:
                if kind != "pair":
                    continue
                if isinstance(loss, IterativeLossWrapper):
                    val = loss(recon, gt, current_iter=cur_iter)
                else:
                    val = loss(recon, gt)
                if isinstance(val, dict):
                    for sub, v in val.items():
                        v = jnp.asarray(v, jnp.float32)
                        logs[f"{log_key}_{sub}".replace("l_g_", "l_ae_")] = v
                        total = total + v
                else:
                    val = jnp.asarray(val, jnp.float32)
                    logs[log_key.replace("l_g_", "l_ae_")] = val
                    total = total + val
            logs["l_ae_total"] = total
            return total, logs

        def step_fn(state: TrainState, batch: dict, key):
            gt = batch["gt"]
            (_loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params_g, gt, state.step, key
            )
            grads = self._freeze_mask(grads)
            updates, new_opt = tx_g.update(grads, state.opt_state_g, state.params_g)
            new_params = optax.apply_updates(state.params_g, updates)
            new_ema = state.ema_params_g
            if state.ema_params_g is not None:
                new_ema = ema_update(state.ema_params_g, new_params, state.step)
                if ema_switch > 0:
                    # ema_switch_iter (reference ae_model.py:175): copy EMA
                    # weights into the online model every N steps.
                    do_switch = (state.step + 1) % ema_switch == 0
                    new_params = jax.tree.map(
                        lambda p, e: jnp.where(do_switch, e, p), new_params, new_ema
                    )
            return (
                state.replace(
                    step=state.step + 1,
                    params_g=new_params,
                    opt_state_g=new_opt,
                    ema_params_g=new_ema,
                ),
                logs,
            )

        donate = (0,) if self.opt.donate_state else ()
        return jax.jit(step_fn, donate_argnums=donate)

    def _init_training(self, params: Any) -> None:
        opt = self.opt
        train_opt = opt.train
        assert train_opt is not None
        self.ema_decay = float(train_opt.ema_decay or 0.0)
        self.ema_update_after_step = int(train_opt.ema_update_after_step or 0)
        self.ema_power = float(train_opt.ema_power or 10)
        self.adaptive_d = False
        self.has_gan = False
        self.batch_augment = None

        for lo in train_opt.losses or [{"type": "l1loss", "loss_weight": 1.0}]:
            loss = build_loss(lo)
            self.losses.append((loss_log_key(loss, lo.get("type")), loss, "pair"))

        total_iter = int(train_opt.total_iter)
        self.tx_g, self.schedule_g = build_optimizer(
            train_opt.optim_ae or train_opt.optim_g or {"type": "AdamW", "lr": 1e-4},
            total_iter,
            train_opt.scheduler,
            train_opt.warmup_iter,
            train_opt.grad_clip,
        )
        self.schedule_d = None
        opt_state = jax.jit(self.tx_g.init)(params)
        ema = jax.tree.map(jnp.copy, params) if self.ema_decay > 0 else None
        self.state = self.replicate(
            TrainState(
                step=jnp.zeros((), jnp.int32),
                params_g=params,
                opt_state_g=opt_state,
                ema_params_g=ema,
            )
        )
        self._train_step = self._build_train_step()

    def feed_data(self, data: dict[str, Any]) -> None:
        batch = self.shard_batch({k: v for k, v in data.items() if k in ("lq", "gt")})
        self.gt = batch.get("gt", batch.get("lq"))
        self.lq = self.gt

    def optimize_parameters(self, current_iter: int) -> None:
        key = jax.random.fold_in(jax.random.key(self.opt.manual_seed or 0), current_iter)
        self.state, logs = self._train_step(self.state, {"gt": self.gt}, key)
        self._pending_logs = logs

    def get_current_log(self) -> dict[str, float]:
        logs = getattr(self, "_pending_logs", {})
        out = {k: float(v) for k, v in logs.items()}
        import numpy as np

        if "l_ae_total" in out and not np.isfinite(out["l_ae_total"]):
            raise RuntimeError("NaN/Inf in AE loss")
        return out

    def test(self, lq=None):
        """Reconstruction inference: output = decode(encode(gt))."""
        import numpy as np

        x = np.asarray(jax.device_get(lq if lq is not None else self.gt), np.float32)
        if x.ndim == 3:
            x = x[None]
        fn_key = ("ae", x.shape[1], x.shape[2])
        if fn_key not in self._apply_cache:
            def apply(params, v):
                latent = self.net_g.apply({"params": params}, v, method="encode")
                return self.net_g.apply({"params": params}, latent, method="decode")

            self._apply_cache[fn_key] = jax.jit(apply)
        out = np.asarray(jax.device_get(self._apply_cache[fn_key](self._infer_params(), x)))
        self.output = out
        return out
