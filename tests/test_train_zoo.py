"""Learning tests for the cost-volume model family (VERDICT r1 item 5).

Round 1 proved only DispNet learns; a training bug in the fused stem
VJP, BN threading, or soft-argmin backward of PSMNet/GCNet/iResNet
would have passed that suite.  Here every cost-volume model must reduce
the supervised loss on the synthetic planar dataset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsmnet_tpu.data import BatchLoader, SyntheticStereoDataset
from dsmnet_tpu.data.transforms import eval_transform
from dsmnet_tpu.losses import parse_loss_name
from dsmnet_tpu.models import create_model
from dsmnet_tpu.train import create_train_state, make_supervised_train_step


_FIRST_LOSS = {}  # model -> first-step loss, shared with the remat test


def _run_steps(name, iters, lr=3e-4, **model_kwargs):
    ds = SyntheticStereoDataset(n=2, hw=(48, 64), max_disp=12,
                                transform=eval_transform())
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    model = create_model(name, maxdisparity=16, **model_kwargs)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=(48, 64))
    step = make_supervised_train_step(model, tx)
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))

    losses = []
    for _ in range(iters):
        for batch, _names in loader:
            state, m = step(state, jnp.asarray(batch), lr, weights)
            losses.append(float(m["loss"]))
    return losses


# psmnet exercises the fused-stem VJP + BN threading + chunked trilinear
# soft-argmin backward; gcnet the GCNet volume/3-D stack; iresnet the
# corr + warp refinement loop.  CPU compile dominates (~3-4 min each) so
# psmnet_basic (same code paths as psmnet) is left out.
@pytest.mark.parametrize("name", ["psmnet", "gcnet", "iresnet"])
def test_supervised_step_learns_synthetic(name):
    losses = _run_steps(name, iters=6)
    _FIRST_LOSS[name] = losses[0]
    assert np.isfinite(losses).all(), f"{name}: non-finite loss {losses}"
    assert losses[-1] < losses[0] * 0.9, (
        f"{name} did not learn: {losses[0]:.4f} -> {losses[-1]:.4f}"
    )


def test_psmnet_remat_step_matches():
    """remat=True must not change the math (only the memory schedule)."""
    if "psmnet" not in _FIRST_LOSS:
        pytest.skip("needs the psmnet convergence test's recorded loss")
    losses = _run_steps("psmnet", iters=1, remat=True)
    assert losses[0] == pytest.approx(_FIRST_LOSS["psmnet"], rel=1e-5)
