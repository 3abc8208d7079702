"""Labeling display backends. The reference hard-wires cv2.imshow/waitKey with
Ubuntu-specific keycodes (_3_label_images.py:319-338, README.md:97 admits the
portability problem). Here the loop talks to a ``LabelBackend`` so the same
logic drives a real OpenCV window, or a headless scripted backend in tests/CI.

Key protocol (normalized): '0'-'9' label keys, 'left'/'right' navigation,
'quit'. Backends translate their raw events into these.
"""
from __future__ import annotations

import abc

import numpy as np

# raw keycodes accepted by the OpenCV backend: arrows on Linux GTK (81/83, the
# reference's hardcoded values) plus common alternatives so other platforms work
_LEFT_CODES = {81, 2, 65361}
_RIGHT_CODES = {83, 3, 65363}


class LabelBackend(abc.ABC):
    @abc.abstractmethod
    def show(self, image: np.ndarray, progress: float) -> str:
        """Display the annotated frame, block for one key, return a normalized
        key: '0'..'9', 'left', 'right', 'quit', or 'noop'."""

    def close(self) -> None:  # pragma: no cover - trivial
        pass


class OpenCVBackend(LabelBackend):
    def __init__(self, window_name: str = "image"):
        self.window_name = window_name

    def show(self, image: np.ndarray, progress: float) -> str:
        import cv2

        cv2.namedWindow(self.window_name, cv2.WINDOW_AUTOSIZE)
        cv2.imshow(self.window_name, image)
        key = cv2.waitKey(0)
        if key == -1 and cv2.getWindowProperty(
            self.window_name, cv2.WND_PROP_VISIBLE
        ) < 1:
            # the user closed the window: treat as quit — returning 'noop'
            # would make the label loop respawn the window forever
            return "quit"
        if ord("0") <= key <= ord("9"):
            return chr(key)
        if key in (ord("q"), 27):
            return "quit"
        if key in _LEFT_CODES:
            return "left"
        if key in _RIGHT_CODES:
            return "right"
        return "noop"

    def close(self) -> None:
        import cv2

        cv2.destroyAllWindows()


class HeadlessBackend(LabelBackend):
    """Replays a scripted key sequence; records every frame it was shown."""

    def __init__(self, keys: list[str]):
        self.keys = list(keys)
        self.shown: list[tuple[tuple, float]] = []
        self._i = 0

    def show(self, image: np.ndarray, progress: float) -> str:
        self.shown.append((image.shape, progress))
        if self._i >= len(self.keys):
            return "quit"
        key = self.keys[self._i]
        self._i += 1
        return key
