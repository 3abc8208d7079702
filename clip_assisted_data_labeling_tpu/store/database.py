"""The CSV label database: ``<root_dir>.csv`` stored in the parent of root_dir.

Schema and semantics replicate the reference exactly so databases interoperate:
  * columns uuid,label,timestamp,predicted_label (_3_label_images.py:285)
  * location: parent dir, named after root_dir (_3:278, _5:113)
  * single-slot timestamped backup before a labeling session (_3:21-34)
  * human-label upsert with unix timestamp (_3:112-126)
  * batch-prediction outer-merge that never clobbers existing rows' labels and
    fills predicted_label/timestamp (_5:144-155)
  * fix_database: copy human labels into predicted_label (_3:236-243)
"""
from __future__ import annotations

import glob
import os
import shutil
import time

import numpy as np
import pandas as pd

from clip_assisted_data_labeling_tpu.config import DB_COLUMNS


def database_path_for(root_dir: str) -> str:
    root_dir = root_dir.rstrip("/")
    return os.path.join(
        os.path.dirname(root_dir), os.path.basename(root_dir) + ".csv"
    )


class LabelDatabase:
    def __init__(self, df: pd.DataFrame, path: str):
        for col in DB_COLUMNS:
            if col not in df.columns:
                df[col] = np.nan
        self.df = df
        self.path = path
        self._pos: dict | None = None
        self._pos_key: tuple | None = None

    def _uuid_positions(self) -> dict:
        """uuid → positional row, cached. In-place cell updates never move
        rows, and every length-changing method here maintains the dict
        itself; the (id, len) key catches a wholesale ``db.df = ...``
        replacement by outside code and triggers a rebuild. On a frame with
        duplicate uuids the FIRST occurrence wins — matching
        ``get_label``'s ``values[0]``."""
        key = (id(self.df), len(self.df))
        if self._pos is None or self._pos_key != key:
            vals = self.df["uuid"].values
            n = len(vals)
            # reversed build: earlier rows overwrite later ones → first wins
            self._pos = {u: i for i, u in zip(range(n - 1, -1, -1), vals[::-1])}
            self._pos_key = key
        return self._pos

    # --- lifecycle --------------------------------------------------------------
    @classmethod
    def load_or_create(cls, root_dir: str) -> "LabelDatabase":
        path = database_path_for(root_dir)
        if os.path.exists(path):
            # dtype pin (here and at every uuid CSV read): an all-digit uuid4
            # hex (possible, ~3e-7/uuid) would otherwise be int-coerced,
            # dropping leading zeros and breaking sidecar lookups
            df = pd.read_csv(path, dtype={"uuid": str})
        else:
            df = pd.DataFrame(columns=list(DB_COLUMNS))
        return cls(df, path)

    def save(self) -> None:
        self.df.to_csv(self.path, index=False)

    def create_backup(self) -> str | None:
        """Single-slot timestamped backup next to the DB (reference _3:21-34)."""
        if not os.path.exists(self.path):
            return None
        folder = os.path.dirname(self.path) or "."
        for f in glob.glob(os.path.join(folder, "*")):
            if "_db_backup_" in os.path.basename(f):
                os.remove(f)
        stamp = time.strftime("%Y%m%d-%H%M%S")
        backup = self.path.replace(".csv", f"_db_backup_{stamp}.csv")
        shutil.copy(self.path, backup)
        return backup

    # --- queries ----------------------------------------------------------------
    def get_label(self, uuid: str):
        pos = self._uuid_positions().get(uuid)
        if pos is None:
            return None
        return self.df["label"].values[pos]

    def get_predicted_label(self, uuid: str):
        pos = self._uuid_positions().get(uuid)
        if pos is None:
            return None
        return self.df["predicted_label"].values[pos]

    def n_labeled(self) -> int:
        return int(self.df["label"].notna().sum())

    def __len__(self) -> int:
        return len(self.df)

    # --- mutations ----------------------------------------------------------------
    def relabel(self, uuid: str, label: float) -> None:
        """Human-label upsert (reference _3_label_images.py:112-126)."""
        now = int(time.time())
        pos = self._uuid_positions().get(uuid)
        if pos is None:
            new_row = {"uuid": uuid, "label": label, "timestamp": now}
            self.df = pd.concat([self.df, pd.DataFrame([new_row])], ignore_index=True)
            self._pos[uuid] = len(self.df) - 1
            self._pos_key = (id(self.df), len(self.df))
        else:
            self.df.iloc[pos, self.df.columns.get_loc("label")] = label
            self.df.iloc[pos, self.df.columns.get_loc("timestamp")] = now

    def ensure_rows(self, uuids: list[str]) -> int:
        """Bulk-register uuids as unlabeled rows (one concat). Predict calls
        this once up front so its per-batch ``merge_predictions`` calls are
        pure in-place updates — without it, a fresh dataset makes every batch
        concat-grow the frame (O(N²/batch) over a run). Returns #added."""
        pos = self._uuid_positions()
        missing = [u for u in uuids if u not in pos]
        if not missing:
            return 0
        add = pd.DataFrame(
            {
                "uuid": missing,
                "label": np.full(len(missing), np.nan),
                "timestamp": np.full(len(missing), np.nan),
                "predicted_label": np.full(len(missing), np.nan),
            }
        )
        n0 = len(self.df)
        self.df = pd.concat([self.df, add], ignore_index=True)
        for i, u in enumerate(missing):
            pos.setdefault(u, n0 + i)
        self._pos_key = (id(self.df), len(self.df))
        return len(missing)

    def merge_predictions(self, uuids: list[str], scores: np.ndarray) -> None:
        """Outer-merge batch predictions (reference _5_predict_labels.py:144-155):
        new uuids get rows; existing rows get predicted_label/timestamp updated;
        human labels are untouched.

        O(batch) in-place for known uuids + one concat for new ones — the old
        implementation re-merged the FULL frame per call (measured 178 ms per
        64-row batch at 200k rows, i.e. hours over a 1M-row predict)."""
        now = float(int(time.time()))
        scores = np.asarray(scores, np.float64)
        pos = self._uuid_positions()
        rows = np.fromiter(
            (pos.get(u, -1) for u in uuids), np.int64, count=len(uuids)
        )
        hit = rows >= 0
        if hit.any():
            pl = self.df.columns.get_loc("predicted_label")
            ts = self.df.columns.get_loc("timestamp")
            hit_rows, hit_scores = rows[hit], scores[hit]
            ok = ~np.isnan(hit_scores)  # parity: a NaN score keeps the old value
            self.df.iloc[hit_rows[ok], pl] = hit_scores[ok]
            self.df.iloc[hit_rows, ts] = now
        if not hit.all():
            miss = ~hit
            add = pd.DataFrame(
                {
                    "uuid": [u for u, m in zip(uuids, miss) if m],
                    "label": np.full(int(miss.sum()), np.nan),
                    "timestamp": np.full(int(miss.sum()), now),
                    "predicted_label": scores[miss],
                }
            )
            n0 = len(self.df)
            self.df = pd.concat([self.df, add], ignore_index=True)
            for i, u in enumerate(add["uuid"].values):
                pos.setdefault(u, n0 + i)
            self._pos_key = (id(self.df), len(self.df))

    def fix_database(self) -> None:
        """Copy human labels into predicted_label (reference _3:236-243)."""
        mask = self.df["label"].notna()
        self.df.loc[mask, "predicted_label"] = self.df.loc[mask, "label"]
