"""Pin the API surface MIGRATING.md documents.

Every import path, constructor keyword, attribute, and return shape the
migration guide shows a reference user must keep working exactly as
written there; this file executes the guide's §3 mapping so a rename or
signature change fails CI before it rots the doc. (The reference's own
surface it mirrors: /root/reference/patchgan/__init__.py:1-8,
trainer.py:29-127.)
"""

import jax.numpy as jnp
import numpy as np
import pytest


def test_top_level_exports_match_guide():
    # the guide's import lines, verbatim
    from patchgan_tpu import (UNet, Discriminator, Trainer,  # noqa: F401
                              COCOStuffDataset, DataLoader)  # noqa: F401
    from patchgan_tpu.inference import InferenceEngine  # noqa: F401
    # the reference's own __all__ is a subset of ours
    import patchgan_tpu
    for name in ('UNet', 'Discriminator', 'Trainer', '__version__'):
        assert name in patchgan_tpu.__all__


def test_guide_training_snippet(tmp_path):
    from patchgan_tpu import UNet, Discriminator, Trainer

    gen = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
               dtype=jnp.bfloat16)
    disc = Discriminator(input_nc=4, ndf=4, n_layers=3,
                         dtype=jnp.bfloat16)
    trainer = Trainer(gen, disc, str(tmp_path / 'ckpt'))
    trainer.loss_type = 'tversky'

    x = np.random.default_rng(0).random((2, 128, 128, 3)) \
        .astype(np.float32)
    y = (np.random.default_rng(1).random((2, 128, 128, 1)) > 0.5
         ).astype(np.float32)
    losses = trainer.batch(x, y, train=True)
    # the reference's exact loss-dict keys, as promised in the guide
    assert list(losses) == ['gen', 'gen_loss', 'gdisc', 'discr',
                            'discf', 'disc']
    # "treat them like numpy scalars (float(v))"
    for v in losses.values():
        assert np.isfinite(float(v))


def test_guide_inference_snippet():
    import jax
    from patchgan_tpu import UNet
    from patchgan_tpu.inference import InferenceEngine

    gen = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid')
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128, 128, 3)))['params']
    engine = InferenceEngine(gen, params, size=128, overlap=0.9,
                             batch_size=4)
    # tiled + stitched, non-square, uint8 ingest (normalised on device)
    mask = engine.predict_image(np.zeros((160, 144, 3), np.uint8))
    assert mask.shape[:2] == (160, 144)


def test_guide_attribute_knobs(tmp_path):
    """Attributes the guide names must exist with the documented
    defaults/semantics (set-before-train contract)."""
    from patchgan_tpu import UNet, Discriminator, Trainer

    trainer = Trainer(UNet(input_nc=3, output_nc=1, nf=8),
                      Discriminator(input_nc=4, ndf=8),
                      str(tmp_path / 'ckpt'))
    assert trainer.accumulate_steps == 1
    assert trainer.freeze_generator == ()
    for attr in ('loss_type', 'compute_iou', 'save_optimizer_state',
                 'save_every_steps', 'neptune_config'):
        assert hasattr(trainer, attr), attr


def test_guide_transfer_error_contract(tmp_path):
    """'errors iff 0 tensors copied' (MIGRATING.md §5)."""
    from patchgan_tpu.utils.transfer import (InvalidCheckpointError,
                                             load_transfer_data)

    # shape mismatch everywhere -> 0 copied -> must raise, never no-op
    keymap = {'x.weight': (('a',), lambda v: np.asarray(v), None)}
    with pytest.raises(InvalidCheckpointError):
        load_transfer_data({'a': np.zeros((2, 2))},
                           {'x.weight': np.zeros((3, 3))},
                           keymap, verbose=False)
