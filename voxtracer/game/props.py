"""Animated props — SURVEY.md §2 #19 (ModifyingProp).

Reference: src/Game/ModifyingProp.{h,cpp}: every `period` seconds reload a
sliding column-window of monu2.vox into the prop's volume
(LoadModelPartial, scene.cpp:531-604)."""

from __future__ import annotations

import os

import numpy as np

from voxtracer.io.vox import load_vox
from voxtracer.scene.volume import grid_from_vox


class ModifyingProp:
    def __init__(self, model_path: str, gridsize: int, period: float = 0.9,
                 starting_index: int = 13, increase_rate: int = 13,
                 max_index: int = 64):
        self.model = load_vox(model_path)
        self.gridsize = gridsize
        self.period = period
        self.index = starting_index
        self.rate = increase_rate
        self.max_index = max_index
        self._elapsed = 0.0
        self._changed = False

    def update(self, dt: float) -> np.ndarray | None:
        """Advance time; returns a fresh grid when the window slides
        (ModifyingProp::Update, ModifyingProp.cpp:11-22), else None."""
        self._elapsed += dt
        self._changed = False
        if self._elapsed < self.period:
            return None
        self._elapsed = 0.0
        self._changed = True
        grid = grid_from_vox(self.model, self.gridsize,
                             column_window=(self.index, self.rate))
        self.index += self.rate
        if self.index > self.max_index:
            self.index = self.rate
        return grid

    @property
    def changed(self) -> bool:
        return self._changed
