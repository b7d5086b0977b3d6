"""Visualisation helpers (reference ``mopa/data/utils/visualize.py:229-670``).

Color palettes for nuScenes / SemanticKITTI / Waymo merged classes, point-on-
image label drawing, range-image rendering, SAM overlay and BEV scatter.
matplotlib/open3d are imported lazily (host-side, optional).
"""

from __future__ import annotations

import numpy as np

# merged-class palettes (RGB 0-255)
NUSCENES_COLOR_PALETTE = [
    (255, 158, 0),   # vehicle
    (0, 0, 230),     # pedestrian
    (255, 61, 99),   # bike
    (112, 128, 144), # traffic boundary
    (50, 205, 50),   # background
    (0, 0, 0),       # ignore
]

SEMANTIC_KITTI_COLOR_PALETTE = [
    (100, 150, 245),  # car
    (80, 30, 180),    # truck
    (30, 60, 150),    # bike
    (255, 30, 30),    # person
    (255, 0, 255),    # road
    (255, 150, 255),  # parking
    (75, 0, 75),      # sidewalk
    (0, 200, 255),    # building
    (0, 175, 0),      # nature
    (255, 240, 150),  # other-objects
    (0, 0, 0),        # ignore
]

WAYMO_COLOR_PALETTE = SEMANTIC_KITTI_COLOR_PALETTE

_PALETTES = {
    "NuScenes": NUSCENES_COLOR_PALETTE,
    "SemanticKITTI": SEMANTIC_KITTI_COLOR_PALETTE,
    "Waymo": WAYMO_COLOR_PALETTE,
}


def _palette(color_palette_type):
    return np.asarray(_PALETTES[color_palette_type], np.uint8)


def draw_points_image_labels(img, img_indices, seg_labels,
                             color_palette_type="SemanticKITTI",
                             point_size=2, save=None, show=False):
    """Scatter per-point class colors over the image (reference :229-280)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    palette = _palette(color_palette_type)
    labels = np.asarray(seg_labels).astype(int)
    labels = np.where(labels < 0, len(palette) - 1, labels)
    colors = palette[np.clip(labels, 0, len(palette) - 1)] / 255.0

    fig, ax = plt.subplots(figsize=(10, 6))
    ax.imshow(np.asarray(img))
    ax.scatter(img_indices[:, 1], img_indices[:, 0], c=colors, s=point_size)
    ax.axis("off")
    if save:
        fig.savefig(save, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)


def draw_bird_eye_view(points, seg_labels=None,
                       color_palette_type="SemanticKITTI", xlim=60, ylim=60,
                       save=None):
    """BEV scatter of a scan (reference draw_bird_eye_view)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    if seg_labels is not None:
        palette = _palette(color_palette_type)
        labels = np.where(np.asarray(seg_labels) < 0, len(palette) - 1,
                          seg_labels).astype(int)
        c = palette[np.clip(labels, 0, len(palette) - 1)] / 255.0
    else:
        c = points[:, 2]
    ax.scatter(points[:, 0], points[:, 1], c=c, s=0.5)
    ax.set_xlim(-xlim, xlim)
    ax.set_ylim(-ylim, ylim)
    ax.set_aspect("equal")
    if save:
        fig.savefig(save, bbox_inches="tight")
    plt.close(fig)


def draw_range_image_labels(proj_label, color_palette_type="SemanticKITTI",
                            save=None):
    """Render a label range image (reference draw_range_image_labels)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    palette = _palette(color_palette_type)
    lab = np.where(proj_label < 0, len(palette) - 1, proj_label).astype(int)
    img = palette[np.clip(lab, 0, len(palette) - 1)]
    fig, ax = plt.subplots(figsize=(16, 2))
    ax.imshow(img)
    ax.axis("off")
    if save:
        fig.savefig(save, bbox_inches="tight")
    plt.close(fig)


def show_anns(sam_mask, image=None, save=None):
    """Overlay SAM mask ids with random colors (reference show_anns)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(0)
    ids = np.unique(sam_mask[sam_mask >= 0])
    overlay = np.zeros(sam_mask.shape + (3,), np.float32)
    for i in ids:
        overlay[sam_mask == i] = rng.random(3)
    fig, ax = plt.subplots(figsize=(10, 6))
    if image is not None:
        ax.imshow(np.asarray(image))
        ax.imshow(overlay, alpha=0.6)
    else:
        ax.imshow(overlay)
    ax.axis("off")
    if save:
        fig.savefig(save, bbox_inches="tight")
    plt.close(fig)


def save_pcd(points, colors=None, path="out.pcd"):
    """Dump a point cloud via open3d when available (reference debug dumps)."""
    try:
        import open3d as o3d
    except ImportError:
        # plain xyz text fallback
        np.savetxt(path + ".xyz", np.asarray(points))
        return
    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(np.asarray(points, np.float64))
    if colors is not None:
        pc.colors = o3d.utility.Vector3dVector(np.asarray(colors, np.float64))
    o3d.io.write_point_cloud(path, pc)
