"""Param-group labeling: BertAdam groups (backbone low-decay) and polyformer
subset optimization incl. bnopt affine."""
import numpy as np

import jax
import jax.numpy as jnp
import flax.traverse_util as tu

from segtran_tpu.train.trainer import label_params, make_class_weights
from segtran_tpu.adapt.polyformer import polyformer_param_labels


def test_label_params_groups():
    params = {"backbone": {"conv": {"kernel": jnp.zeros((3, 3))}},
              "voxel_fusion": {"translayers_0":
                               {"query": {"kernel": jnp.zeros((4, 4))}}},
              "alphas": jnp.zeros(2)}
    labels = tu.flatten_dict(label_params(params))
    assert labels[("backbone", "conv", "kernel")] == "low_decay"
    assert labels[("voxel_fusion", "translayers_0", "query",
                   "kernel")] == "normal"
    assert labels[("alphas",)] == "high_lr"


def test_class_weights():
    w = np.asarray(make_class_weights(3))
    np.testing.assert_allclose(w, [0.0, 0.5, 0.5])
    w2 = np.asarray(make_class_weights(3, focus_class=2))
    np.testing.assert_allclose(w2, [0.0, 1 / 3, 2 / 3])


def _poly_params():
    return {
        "inc": {"double_conv_0": {"kernel": jnp.zeros((3, 3))},
                "double_conv_1": {"scale": jnp.zeros(3),
                                  "bias": jnp.zeros(3)}},
        "polyformer": {"polyformer_layers_0": {
            "attractors": jnp.zeros((1, 4, 8)),
            "in_ator_trans": {
                "query": {"kernel": jnp.zeros((8, 8))},
                "key": {"kernel": jnp.zeros((8, 8))},
                "out_trans": {"first_linear": {"kernel": jnp.zeros((8, 8))}},
            },
            "ator_out_trans": {"query": {"kernel": jnp.zeros((8, 8))}},
        }},
        "outc": {"conv": {"kernel": jnp.zeros((1, 1))}},
    }


def test_polyformer_labels_k_only():
    labels = tu.flatten_dict(polyformer_param_labels(_poly_params(), "k"))
    trained = {k for k, v in labels.items() if v == "normal"}
    assert trained == {("polyformer", "polyformer_layers_0", "in_ator_trans",
                        "key", "kernel")}


def test_polyformer_labels_allpoly_and_h():
    labels = tu.flatten_dict(
        polyformer_param_labels(_poly_params(), "allpoly,h"))
    assert labels[("polyformer", "polyformer_layers_0",
                   "attractors")] == "normal"
    assert labels[("outc", "conv", "kernel")] == "normal"
    assert labels[("inc", "double_conv_0", "kernel")] == "frozen"


def test_polyformer_labels_bnopt_affine():
    params = _poly_params()
    batch_stats = {"inc": {"double_conv_1": {"mean": jnp.zeros(3),
                                             "var": jnp.ones(3)}}}
    labels = tu.flatten_dict(polyformer_param_labels(
        params, "k", batch_stats=batch_stats, bn_opt_scheme="affine"))
    assert labels[("inc", "double_conv_1", "scale")] == "normal"
    assert labels[("inc", "double_conv_1", "bias")] == "normal"
    assert labels[("inc", "double_conv_0", "kernel")] == "frozen"
