#!/usr/bin/env python
"""Minimal model-serving HTTP endpoint (reference
tools/deployment/mmcls2torchserve.py + mmcls_handler.py analog).

Serves either a native checkpoint (jitted forward on the local device) or a
deployed artifact (StableHLO / SavedModel via gkgnet_tpu.core.export).

  python tools/deployment/serve.py CONFIG --checkpoint CKPT [--port 8080]
  python tools/deployment/serve.py CONFIG --artifact model.hlo [--port 8080]

API (torchserve-compatible shape):
  POST /predictions/gkgnet   body = raw image bytes (jpg/png)
    -> {"pred_label": [...], "pred_score": [...], "pred_class": [...]}
  GET  /ping                 -> {"status": "Healthy"}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def build_scorer(args, cfg):
    """Returns (score_fn(img_f32 NHWC) -> (1, C) np.ndarray, input size)."""
    import numpy as np

    size = cfg.model["size"]
    if args.artifact:
        from gkgnet_tpu.core.export import load_exported_classifier

        clf = load_exported_classifier(args.artifact, args.backend)
        assert clf.batch == 1, "serve expects a batch-1 artifact"
        return lambda img: np.asarray(clf(img)), size

    import jax
    import jax.numpy as jnp

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, tools_dir)
    from inference import init_model

    model, state, _ = init_model(args.config, args.checkpoint)
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants}

    @jax.jit
    def forward(imgs):
        cls_score, _ = model.apply(variables, imgs, train=False)
        return jax.nn.sigmoid(cls_score.astype(jnp.float32))

    return lambda img: np.asarray(forward(img)), size


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--artifact", default=None,
                   help="StableHLO file / SavedModel dir (batch 1)")
    p.add_argument("--backend", choices=["auto", "stablehlo", "savedmodel"],
                   default="auto")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args()

    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    import numpy as np
    from PIL import Image

    from gkgnet_tpu.core.config import Config
    from gkgnet_tpu.data.coco import COCO_CLASSES
    from gkgnet_tpu.data.pipelines import build_pipeline

    cfg = Config.fromfile(args.config)
    score_fn, size = build_scorer(args, cfg)
    pipeline = build_pipeline([
        c for c in cfg.data["test"]["pipeline"]
        if c["type"] != "LoadImageFromFile"])
    classes = cfg.data["test"].get("classes") or list(COCO_CLASSES)
    thr = args.threshold

    # warm up compile before accepting traffic
    score_fn(np.zeros((1, size, size, 3), np.float32))

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/ping":
                self._send(200, {"status": "Healthy"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if not self.path.startswith("/predictions"):
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
                out = pipeline({"img": img})
                batch = out["img"][None].astype(np.float32)
                scores = score_fn(batch)[0]
                keep = np.where(scores >= thr)[0]
                self._send(200, {
                    "pred_label": [int(i) for i in keep],
                    "pred_score": [round(float(scores[i]), 6) for i in keep],
                    "pred_class": [classes[i] for i in keep],
                })
            except Exception as e:  # noqa: BLE001 — report to client
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *a):
            print(f"[serve] {fmt % a}", file=sys.stderr)

    server = HTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port} (POST /predictions/gkgnet)")
    server.serve_forever()


if __name__ == "__main__":
    main()
