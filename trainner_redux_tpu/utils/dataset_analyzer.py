"""Dataset complexity analysis (parity: reference utils/dataset_analyzer.py:22-300).

Samples images from a dataset folder and scores edge density, texture
variance, color richness and resolution statistics; zero-config training
uses the score to pick crop sizes / augmentation intensity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import cv2
import numpy as np


@dataclass
class DatasetAnalysis:
    num_images: int
    mean_height: float
    mean_width: float
    edge_density: float
    texture_variance: float
    color_richness: float
    complexity_score: float  # 0..1

    @property
    def recommended_lq_size(self) -> int:
        if self.complexity_score > 0.66:
            return 64
        if self.complexity_score > 0.33:
            return 48
        return 32


class DatasetAnalyzer:
    def __init__(self, sample_limit: int = 50, seed: int = 0) -> None:
        self.sample_limit = sample_limit
        self.rng = np.random.default_rng(seed)

    def analyze_folder(self, folder: str) -> DatasetAnalysis:
        names = [
            f for f in sorted(os.listdir(folder))
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
        ]
        if not names:
            raise ValueError(f"no images found under {folder}")
        if len(names) > self.sample_limit:
            idx = self.rng.choice(len(names), self.sample_limit, replace=False)
            names = [names[i] for i in sorted(idx)]

        heights, widths, edges, textures, colors = [], [], [], [], []
        for name in names:
            img = cv2.imread(os.path.join(folder, name), cv2.IMREAD_COLOR)
            if img is None:
                continue
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            edge_map = cv2.Canny(gray, 100, 200)
            edges.append(edge_map.mean() / 255.0)
            lap = cv2.Laplacian(gray, cv2.CV_64F)
            textures.append(float(lap.var()) / 255.0**2)
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            colors.append(float(hsv[..., 1].mean()) / 255.0)

        edge_density = float(np.mean(edges))
        texture_variance = float(np.mean(textures))
        color_richness = float(np.mean(colors))
        complexity = float(
            np.clip(
                0.5 * min(edge_density * 10, 1.0)
                + 0.3 * min(texture_variance * 20, 1.0)
                + 0.2 * color_richness,
                0.0,
                1.0,
            )
        )
        return DatasetAnalysis(
            num_images=len(names),
            mean_height=float(np.mean(heights)),
            mean_width=float(np.mean(widths)),
            edge_density=edge_density,
            texture_variance=texture_variance,
            color_richness=color_richness,
            complexity_score=complexity,
        )
