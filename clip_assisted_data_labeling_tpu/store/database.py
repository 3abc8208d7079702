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

    # --- lifecycle --------------------------------------------------------------
    @classmethod
    def load_or_create(cls, root_dir: str) -> "LabelDatabase":
        path = database_path_for(root_dir)
        if os.path.exists(path):
            df = pd.read_csv(path)
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
        row = self.df.loc[self.df["uuid"] == uuid]
        if len(row) == 0:
            return None
        return row["label"].values[0]

    def get_predicted_label(self, uuid: str):
        row = self.df.loc[self.df["uuid"] == uuid]
        if len(row) == 0:
            return None
        return row["predicted_label"].values[0]

    def n_labeled(self) -> int:
        return int(self.df["label"].notna().sum())

    def __len__(self) -> int:
        return len(self.df)

    # --- mutations ----------------------------------------------------------------
    def relabel(self, uuid: str, label: float) -> None:
        """Human-label upsert (reference _3_label_images.py:112-126)."""
        now = int(time.time())
        rows = self.df.loc[self.df["uuid"] == uuid]
        if len(rows) == 0:
            new_row = {"uuid": uuid, "label": label, "timestamp": now}
            self.df = pd.concat([self.df, pd.DataFrame([new_row])], ignore_index=True)
        else:
            idx = rows.index[0]
            self.df.loc[idx, "label"] = label
            self.df.loc[idx, "timestamp"] = now

    def merge_predictions(self, uuids: list[str], scores: np.ndarray) -> None:
        """Outer-merge batch predictions (reference _5_predict_labels.py:144-155):
        new uuids get rows; existing rows get predicted_label/timestamp updated;
        human labels are untouched."""
        now = int(time.time())
        batch = pd.DataFrame(
            {
                "uuid": list(uuids),
                "predicted_label": np.asarray(scores, np.float64),
                "timestamp": np.full(len(uuids), now, dtype=np.float64),
            }
        )
        merged = self.df.merge(
            batch, on="uuid", how="outer", suffixes=("", "_new")
        )
        for col in ("predicted_label", "timestamp"):
            merged[col] = merged[f"{col}_new"].where(
                merged[f"{col}_new"].notna(), merged[col]
            )
            merged.drop(columns=[f"{col}_new"], inplace=True)
        self.df = merged

    def fix_database(self) -> None:
        """Copy human labels into predicted_label (reference _3:236-243)."""
        mask = self.df["label"].notna()
        self.df.loc[mask, "predicted_label"] = self.df.loc[mask, "label"]
