"""Annotated-image output: draw prediction/info text onto an image.

TPU-framework equivalent of the reference's ``imshow_infos``
(`/root/reference/mmcls/core/visualization/image.py:302-342`): render a
``{key: value}`` info dict as text rows onto the image, return the
annotated array, optionally write it to disk. The reference drives a
matplotlib figure context (interactive windows, SPACE-to-continue); this
implementation is PIL-based and headless-first — the library use case
(eval tooling, CI, batch jobs) — while keeping the same call shape:

    img = imshow_infos('cat.jpg', {'cat': 0.98, 'pred_class': 'cat'},
                       out_file='out.png')
"""

from __future__ import annotations

import numpy as np


def _load_image(img) -> "np.ndarray":
    """str path | ndarray (H, W, 3) uint8/float -> RGB uint8 array."""
    if isinstance(img, str):
        from PIL import Image

        with Image.open(img) as im:
            return np.asarray(im.convert("RGB"))
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr[..., :3]


def imshow_infos(
    img,
    infos: dict,
    text_color=(255, 255, 255),
    font_size: int = 26,
    row_width: int = 20,
    win_name: str = "",
    show: bool = False,
    wait_time: float = 0,
    out_file: str | None = None,
) -> "np.ndarray":
    """Draw an info dict onto an image.

    Args:
      img: path or (H, W, 3) array.
      infos: ``{label: value}``; float values are rendered as ``.2f``
        (reference image.py:255-257).
      text_color: RGB tuple or color name for the text.
      font_size: text size in pixels (TrueType when available, else the
        PIL bitmap font).
      row_width: vertical spacing between rows.
      show: pop an interactive window (matplotlib) — off by default;
        headless environments keep working.
      out_file: write the annotated image here when given.

    Returns:
      (H, W, 3) uint8 annotated image.
    """
    from PIL import Image, ImageDraw, ImageFont

    arr = _load_image(img)
    im = Image.fromarray(arr)
    draw = ImageDraw.Draw(im, "RGBA")
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", font_size)
    except OSError:
        font = ImageFont.load_default()

    x, y = 3, max(row_width // 2, 2)
    step = max(row_width, font_size + 4)
    for k, v in infos.items():
        if isinstance(v, float):
            v = f"{v:.2f}"
        label_text = f"{k}: {v}"
        # contrasting backing bar so white text stays readable on any image
        bbox = draw.textbbox((x, y), label_text, font=font)
        draw.rectangle([bbox[0] - 2, bbox[1] - 1, bbox[2] + 2, bbox[3] + 1],
                       fill=(0, 0, 0, 160))
        draw.text((x, y), label_text, fill=text_color, font=font)
        y += step

    out = np.asarray(im)
    if out_file is not None:
        im.save(out_file)
    if show:  # pragma: no cover - interactive path
        import matplotlib.pyplot as plt

        plt.figure(win_name or "imshow_infos")
        plt.imshow(out)
        plt.axis("off")
        plt.show(block=wait_time == 0)
        if wait_time:
            plt.pause(wait_time)
    return out


def imshow_predictions(img, preds, out_file: str | None = None,
                       **kwargs) -> "np.ndarray":
    """Convenience wrapper for classifier predictions: ``preds`` is a list
    of ``{'class_name', 'score'}`` dicts (tools/inference.py output)."""
    infos = {p["class_name"]: float(p["score"]) for p in preds}
    return imshow_infos(img, infos, out_file=out_file, **kwargs)
