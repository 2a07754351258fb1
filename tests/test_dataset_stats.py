"""Per-dataset pixel-stats auto-selection (data/stats.py): parity with the
reference's per-(task, --gray alpha) JSON loading, train2d.py:406-414."""
import json
import logging

import pytest

from segtran_tpu.data.stats import DS_STATS, load_dataset_stats


def test_builtin_tables_match_reference_values():
    # spot-check entries against the shipped reference JSONs' numbers
    mean, std = load_dataset_stats("fundus", 0.5, "train")
    assert mean == (0.415, 0.311, 0.238) and std == (0.180, 0.145, 0.112)
    mean, std = load_dataset_stats("fundus", 0.0, "valid2")
    assert mean == (0.695, 0.397, 0.175) and std == (0.209, 0.161, 0.132)
    mean, std = load_dataset_stats("polyp", 1.0, "ETIS-LaribPolypDB")
    assert mean == (0.475, 0.475, 0.475) and std == (0.242, 0.242, 0.242)
    mean, std = load_dataset_stats("oct", 0.5, "duke")
    assert mean == (0.200, 0.200, 0.200)
    # alpha is rounded to 1 decimal like the reference's {:.1f} template
    assert load_dataset_stats("fundus", 0.499999, "train")[0] == \
        (0.415, 0.311, 0.238)
    # every table has mean/std keys aligned
    for (task, alpha), table in DS_STATS.items():
        assert set(table["mean"]) >= set(table["std"]), (task, alpha)
        for ds, v in table["mean"].items():
            assert len(v) == 3, (task, alpha, ds)


def test_unknown_alpha_raises_listing_available():
    with pytest.raises(ValueError, match=r"0\.0.*0\.5.*1\.0"):
        load_dataset_stats("fundus", 0.3, "train")
    with pytest.raises(ValueError, match="oct"):
        load_dataset_stats("oct", 0.0, "duke")


def test_unknown_dataset_warns_and_falls_back(caplog):
    with caplog.at_level(logging.WARNING, logger="segtran_tpu"):
        mean, std = load_dataset_stats("fundus", 0.5, "my-custom-ds")
    assert mean == (0.5, 0.5, 0.5) and std == (0.25, 0.25, 0.25)
    assert any("my-custom-ds" in r.message for r in caplog.records)


def test_unknown_task_warns_and_falls_back(caplog):
    with caplog.at_level(logging.WARNING, logger="segtran_tpu"):
        mean, std = load_dataset_stats("custom-task", 0.5, "ds")
    assert mean == (0.5, 0.5, 0.5)


def test_explicit_stats_json_overrides(tmp_path):
    path = tmp_path / "s.json"
    path.write_text(json.dumps({"mean": {"train": [0.1, 0.2, 0.3]},
                                "std": {"train": [0.4, 0.5, 0.6]}}))
    mean, std = load_dataset_stats("fundus", 0.5, "train",
                                   stats_json=str(path))
    assert mean == (0.1, 0.2, 0.3) and std == (0.4, 0.5, 0.6)


def test_train2d_load_stats_auto_selects():
    """The CLI shim picks the built-in table from args.task_name + --gray."""
    import argparse
    from segtran_tpu.cli.train2d import load_stats
    args = argparse.Namespace(task_name="fundus", gray_alpha=0.5,
                              stats_json=None)
    assert load_stats(args, "train") == ((0.415, 0.311, 0.238),
                                         (0.180, 0.145, 0.112))
