"""Live network viewer — the SIBR remote-viewer wire protocol.

Behavioral mirror of gaussian_renderer/network_gui.py: a non-blocking TCP
listener; each message is a 4-byte little-endian length + JSON camera/flags;
the reply is raw RGB bytes followed by a length-prefixed verify string. The
incoming matrices arrive in the viewer's convention (column-flipped,
transposed w.r.t. our mathematical matrices) and are converted here.
"""
from __future__ import annotations

import json
import socket
from typing import NamedTuple

import numpy as np


class ViewerRequest(NamedTuple):
    camera: "object | None"  # RenderCamera or None (0-resolution keep-alive)
    do_training: bool
    shs_python: bool
    rot_scale_python: bool
    keep_alive: bool
    scaling_modifier: float
    timestamp: float


class NetworkViewer:
    def __init__(self, host: str = "127.0.0.1", port: int = 9898):
        self.host = host
        self.port = port
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.conn = None

    def init(self, retries: int = 10) -> int:
        """Bind with a port-retry loop (train.py:413-418). port=0 asks the
        OS for an ephemeral port (tests); the bound port is returned."""
        for i in range(retries):
            try:
                self.listener.bind((self.host, self.port + i if self.port else 0))
                self.listener.listen()
                self.listener.settimeout(0)
                self.port = self.listener.getsockname()[1]
                return self.port
            except OSError:
                continue
        raise OSError("no free viewer port")

    def try_connect(self) -> None:
        try:
            self.conn, _addr = self.listener.accept()
            self.conn.settimeout(None)
        except Exception:
            pass

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer peer closed")
            buf += chunk
        return buf

    def _read_message(self) -> dict:
        n = int.from_bytes(self._read_exact(4), "little")
        return json.loads(self._read_exact(n).decode("utf-8"))

    def receive(self) -> ViewerRequest:
        msg = self._read_message()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        if width == 0 or height == 0:
            return ViewerRequest(None, False, False, False, False, 1.0, 0.0)
        from .rendering import RenderCamera

        view_t = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        proj_t = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        # viewer sends GL-flavored transposed matrices with flipped y/z
        view_t[:, 1] *= -1
        view_t[:, 2] *= -1
        proj_t[:, 1] *= -1
        view = view_t.T  # our convention: mathematical w2c
        proj = proj_t.T
        campos = np.linalg.inv(view)[:3, 3]
        import math

        cam = RenderCamera.from_fov(
            view, proj, campos, width, height, msg["fov_x"], msg["fov_y"]
        )
        return ViewerRequest(
            camera=cam,
            do_training=bool(msg["train"]),
            shs_python=bool(msg["shs_python"]),
            rot_scale_python=bool(msg["rot_scale_python"]),
            keep_alive=bool(msg["keep_alive"]),
            scaling_modifier=float(msg["scaling_modifier"]),
            timestamp=float(msg.get("timestamp", 0.0)),
        )

    def send(self, image: np.ndarray | None, verify: str) -> None:
        """image: [H, W, 3] float in [0,1] or None."""
        if image is not None:
            payload = (np.clip(image, 0, 1) * 255).astype(np.uint8).tobytes()
            self.conn.sendall(payload)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def poll(self, render_fn, source_path: str, training_active: bool = True):
        """One GUI service round (train.py:93-106): accept if unconnected,
        else serve requests until the viewer releases the loop."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                req = self.receive()
                img = None
                if req.camera is not None:
                    img = render_fn(req)
                self.send(img, source_path)
                if req.do_training and (training_active or not req.keep_alive):
                    break
            except Exception:
                self.conn = None

    def close(self) -> None:
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
