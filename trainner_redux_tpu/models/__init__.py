"""Model (trainer) selection — rule-based like the reference
(/root/reference/traiNNer/models/__init__.py:16-40):
high_order_degradation -> RealESRGANModel (RealESRGANPairedModel when
dataroot_lq_prob > 0), network_ae without network_g -> AEModel, else SRModel.
"""

from __future__ import annotations

from trainner_redux_tpu.utils.redux_options import ReduxOptions
from trainner_redux_tpu.utils.registry import MODEL_REGISTRY

__all__ = ["build_model", "MODEL_REGISTRY"]


def build_model(opt: ReduxOptions):
    import trainner_redux_tpu.models.sr_model  # noqa: F401

    if opt.high_order_degradation:
        import trainner_redux_tpu.models.realesrgan_model  # noqa: F401

        if opt.dataroot_lq_prob > 0:
            model = MODEL_REGISTRY.get("RealESRGANPairedModel")(opt)
        else:
            model = MODEL_REGISTRY.get("RealESRGANModel")(opt)
    elif opt.network_ae is not None and opt.network_g is None:
        import trainner_redux_tpu.models.ae_model  # noqa: F401

        model = MODEL_REGISTRY.get("AEModel")(opt)
    else:
        model = MODEL_REGISTRY.get("SRModel")(opt)
    return model
