"""Sorting strategies + fused-attention kernel parity (interpret mode)."""
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from clip_assisted_data_labeling_tpu.ops.attention import attention_xla, fused_attention
from clip_assisted_data_labeling_tpu.store.database import LabelDatabase
from clip_assisted_data_labeling_tpu.store.sidecar import write_sidecar
from clip_assisted_data_labeling_tpu.ui.sorting import re_order_images


@pytest.fixture()
def sorted_dataset(tmp_path, rng):
    root = tmp_path / "ds"
    root.mkdir()
    preds = [0.9, 0.1, 0.5, 0.3, 0.7]
    files = []
    for i, p in enumerate(preds):
        uuid = f"u{i}"
        Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)).save(
            root / f"{uuid}.jpg"
        )
        files.append(str(root / f"{uuid}.jpg"))
    db = LabelDatabase.load_or_create(str(root))
    db.merge_predictions([f"u{i}" for i in range(5)], np.asarray(preds))
    return root, files, db


def test_sort_strategies(sorted_dataset):
    root, files, db = sorted_dataset
    uid = lambda f: os.path.splitext(os.path.basename(f))[0]

    assert re_order_images(files, db, str(root), "uuid") == files
    bad = [uid(f) for f in re_order_images(files, db, str(root), "bad_first")]
    assert bad == ["u1", "u3", "u2", "u4", "u0"]
    good = [uid(f) for f in re_order_images(files, db, str(root), "good_first")]
    assert good == ["u0", "u4", "u2", "u3", "u1"]
    middle = [uid(f) for f in re_order_images(files, db, str(root), "middle")]
    assert middle[0] == "u2"  # 0.5 == median
    # reference dialog labels resolve too
    assert [uid(f) for f in re_order_images(files, db, str(root), "Predicted bad first")] == bad

    with pytest.raises(ValueError):
        re_order_images(files, db, str(root), "nonsense")


def test_diversity_sort_from_sidecars(sorted_dataset, rng):
    root, files, _db = sorted_dataset
    # 2 clusters: u0-u2 near base, u3/u4 near -base
    base = rng.normal(0, 1, 8).astype(np.float32)
    for i in range(5):
        center = base if i < 3 else -base
        write_sidecar(
            str(root / f"u{i}.pt"), "m/x",
            {"square_padded_crop": center + rng.normal(0, 0.01, 8).astype(np.float32)},
        )
    ordered = re_order_images(files, _db, str(root), "diversity")
    assert len(ordered) == 5
    first_two = {os.path.basename(f)[1] for f in ordered[:2]}
    # the first two picks must span both clusters
    assert any(c in "012" for c in first_two) and any(c in "34" for c in first_two)


def test_diversity_sort_from_store(sorted_dataset, rng):
    """Store-backed diversity path (the vectorized gather): valid rows order
    by farthest-point across clusters; invalid and store-missing images tail
    the session instead of vanishing."""
    from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore

    root, files, _db = sorted_dataset
    base = rng.normal(0, 1, 8).astype(np.float32)
    # u4 is NOT in the store; u3 is invalid — both must tail
    st = EmbeddingStore.create(str(root), "m/x", ["square_padded_crop"], 8,
                               [f"u{i}" for i in range(4)], with_stats=False)
    embs = np.stack([(base if i < 2 else -base)
                     + rng.normal(0, 0.01, 8).astype(np.float32)
                     for i in range(4)])[:, None, :]
    st.write_rows(0, embs, valid=np.asarray([True, True, True, False]))
    st.flush()

    ordered = re_order_images(files, _db, str(root), "diversity")
    names = [os.path.basename(f)[1] for f in ordered]
    assert len(ordered) == 5
    # first two picks span the clusters {u0,u1} vs {u2}
    assert any(c in "01" for c in names[:2]) and "2" in names[:2]
    # invalid + missing tail in original order
    assert names[-2:] == ["3", "4"]


def test_fused_attention_interpret_matches_xla(rng):
    q = jnp.asarray(rng.normal(0, 1, (2, 3, 9, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (2, 3, 9, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (2, 3, 9, 8)).astype(np.float32))
    ref = np.asarray(attention_xla(q, k, v, scale=0.3))
    got = np.asarray(fused_attention(q, k, v, scale=0.3, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_packed_attention_interpret_matches_xla(rng):
    from clip_assisted_data_labeling_tpu.ops.attention import fused_attention_packed

    b, s, h, d = 2, 9, 3, 8
    w = h * d
    qkv = rng.normal(0, 1, (b, s, 3 * w)).astype(np.float32)
    q = qkv[..., :w].reshape(b, s, h, d).transpose(0, 2, 1, 3)
    k = qkv[..., w : 2 * w].reshape(b, s, h, d).transpose(0, 2, 1, 3)
    v = qkv[..., 2 * w :].reshape(b, s, h, d).transpose(0, 2, 1, 3)
    ref = np.asarray(attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.3))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, w)
    got = np.asarray(
        fused_attention_packed(jnp.asarray(qkv), heads=h, scale=0.3, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_review_sort_orders_by_disagreement(tmp_path):
    """'review' (new beyond the reference): labeled images sorted by descending
    |label - predicted_label|; unlabeled/unpredicted rows excluded."""
    import pandas as pd

    from clip_assisted_data_labeling_tpu.store.database import LabelDatabase

    root = tmp_path / "ds"
    root.mkdir()
    rows = [
        ("aaa", 0.9, 0.1),   # disagreement 0.8 -> first
        ("bbb", 0.5, 0.45),  # 0.05 -> last of labeled
        ("ccc", 0.2, 0.6),   # 0.4 -> middle
        ("ddd", None, 0.7),  # unlabeled -> excluded
        ("eee", 0.3, None),  # no prediction -> excluded
    ]
    for u, *_ in rows:
        (root / f"{u}.jpg").write_bytes(b"x")
    df = pd.DataFrame(
        {
            "uuid": [r[0] for r in rows],
            "label": [r[1] for r in rows],
            "timestamp": [0.0] * len(rows),
            "predicted_label": [r[2] for r in rows],
        }
    )
    db = LabelDatabase(df, str(tmp_path / "ds.csv"))
    files = [str(root / f"{r[0]}.jpg") for r in rows]
    ordered = re_order_images(files, db, str(root), "review")
    names = [os.path.splitext(os.path.basename(f))[0] for f in ordered]
    assert names == ["aaa", "ccc", "bbb"]


def test_prediction_sorts_nan_last_and_nested_paths(tmp_path, rng):
    """Round-3 self-review: unpredicted (NaN) rows sort LAST in every strategy
    (the reference's plain reversal put them FIRST in good_first), and images
    in subdirectories resolve through their discovered paths instead of being
    silently dropped from the session."""
    root = tmp_path / "ds"
    (root / "sub").mkdir(parents=True)
    files = []
    for uuid, rel in (("a", "a.jpg"), ("b", "sub/b.jpg"), ("c", "c.jpg")):
        p = root / rel
        Image.fromarray(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)).save(p)
        files.append(str(p))
    db = LabelDatabase.load_or_create(str(root))
    # 'c' never predicted: in the DB (via a label that is then unlabeled —
    # relabel adds the row) with NaN predicted_label
    db.relabel("c", np.nan)
    db.merge_predictions(["a", "b"], np.asarray([0.2, 0.8]))

    uid = lambda f: os.path.splitext(os.path.basename(f))[0]
    for sort, expect in (("good_first", ["b", "a", "c"]),
                         ("bad_first", ["a", "b", "c"])):
        got = [uid(f) for f in re_order_images(files, db, str(root), sort)]
        assert got == expect, (sort, got)
    mid = [uid(f) for f in re_order_images(files, db, str(root), "middle")]
    assert mid[-1] == "c", mid  # NaN last; nested 'b' present


def test_prompt_sort_option_eof_falls_back_to_default(monkeypatch, capsys):
    """Non-interactive runs (closed stdin) must get the default sort, not an
    EOFError crash — the headless drive path without --sort."""
    from clip_assisted_data_labeling_tpu.ui.sorting import prompt_sort_option

    def raise_eof(_prompt):
        raise EOFError

    monkeypatch.setattr("builtins.input", raise_eof)
    assert prompt_sort_option("uuid") == "uuid"
    assert prompt_sort_option(default="diversity") == "diversity"
