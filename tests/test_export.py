"""Export → reload → numerically-identical inference (the reference's
ONNX export/reload test analog, tests/test_models.py:120-143)."""

import jax
import jax.numpy as jnp
import numpy as np

from py4cast_tpu.export import export_forward, load_and_infer
from py4cast_tpu.models import build_model_from_settings, get_model_kls_and_settings


def test_export_reload_matches(tmp_path):
    kls, _ = get_model_kls_and_settings("HalfUNet")
    from py4cast_tpu.models.base import settings_from_dict

    settings = settings_from_dict(kls.settings_kls, {"num_filters": 8, "depth": 2})
    model = build_model_from_settings("HalfUNet", 5, 3, settings, (16, 16))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 16, 5)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x)
    y_direct = model.apply(variables, x)

    dest = export_forward(model, variables, (16, 16), tmp_path / "halfunet.shlo")
    assert dest.exists() and dest.stat().st_size > 0

    y_reload = load_and_infer(dest, np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y_direct), np.asarray(y_reload), rtol=1e-5, atol=1e-6
    )
