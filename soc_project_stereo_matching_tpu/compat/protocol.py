"""The reference TCP wire protocol (byte-exact).

Layout (HostScript_Server/server.py:5-13, 105-177; device
ZedBoard/Vitis/lwip_tcp_perf_client/src/tcp_perf_client.c:73-201):

* client -> server: 1 request byte
    0 = close, 1 = request image + calibration, 2 = request image,
    3 = depth-image upload follows
* server -> client (types 1/2): header ``<BiHH`` (type, seq, width,
  height); for type 1 an 80-byte calibration blob (20 LE floats, see
  data/calib.py) follows; then the image payload: LEFT image then RIGHT
  image, each as three channel planes in B, G, R order, each plane sent
  row by row (width bytes per row).
* client -> server (type 3): header ``<BiHH`` (3, seq, width, height)
  followed by height rows of width float32 depth values.
* server -> client close status: single byte 0.

NB the protocol sends calibration ONLY for request type 1; type 2 frames
reuse the previous calibration (tcp_perf_client.c:170-174).
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from ..data.calib import StereoCalib, WIRE_SIZE

HEADER_FORMAT = "<BiHH"
HEADER_SIZE = struct.calcsize(HEADER_FORMAT)  # 9 bytes

REQ_CLOSE = 0
REQ_IMG_CALIB = 1
REQ_IMG = 2
REQ_DEPTH_UPLOAD = 3


@dataclass
class FrameHeader:
    type_id: int
    seq: int
    width: int
    height: int

    def pack(self) -> bytes:
        return struct.pack(HEADER_FORMAT, self.type_id, self.seq,
                           self.width, self.height)

    @classmethod
    def unpack(cls, blob: bytes) -> "FrameHeader":
        return cls(*struct.unpack(HEADER_FORMAT, blob))


def recv_exact(conn: socket.socket, size: int) -> bytes:
    """Read exactly `size` bytes (server.py:133-146 semantics)."""
    buf = bytearray()
    while len(buf) < size:
        chunk = conn.recv(size - len(buf))
        if not chunk:
            raise ConnectionError("connection interrupted during recv_exact")
        buf += chunk
    return bytes(buf)


# ---------------------------------------------------------------------------
# Image payload: channel-planar B,G,R rows per image
# ---------------------------------------------------------------------------

def encode_image_planes(img_bgr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 BGR -> channel-planar wire bytes."""
    h, w, c = img_bgr.shape
    assert c == 3
    return img_bgr.transpose(2, 0, 1).tobytes()  # channel, row, col


def decode_image_planes(blob: bytes, width: int, height: int) -> np.ndarray:
    """Wire bytes -> (H, W, 3) uint8 BGR."""
    arr = np.frombuffer(blob, dtype=np.uint8, count=3 * height * width)
    return arr.reshape(3, height, width).transpose(1, 2, 0)


def send_stereo_frame(conn: socket.socket, type_id: int, seq: int,
                      img_left_bgr: np.ndarray, img_right_bgr: np.ndarray,
                      calib: Optional[StereoCalib] = None) -> None:
    h, w = img_left_bgr.shape[:2]
    conn.sendall(FrameHeader(type_id, seq, w, h).pack())
    if type_id == REQ_IMG_CALIB and calib is not None:
        conn.sendall(calib.pack())
    conn.sendall(encode_image_planes(img_left_bgr))
    conn.sendall(encode_image_planes(img_right_bgr))


def recv_stereo_frame(
    conn: socket.socket,
) -> Tuple[FrameHeader, Optional[StereoCalib], np.ndarray, np.ndarray]:
    """Receive a type-1/2 frame (or a close status -> header.type_id == 0)."""
    first = recv_exact(conn, 1)
    if first[0] == REQ_CLOSE:
        return FrameHeader(REQ_CLOSE, -1, 0, 0), None, None, None
    header = FrameHeader.unpack(first + recv_exact(conn, HEADER_SIZE - 1))
    calib = None
    if header.type_id == REQ_IMG_CALIB:
        calib = StereoCalib.unpack(recv_exact(conn, WIRE_SIZE),
                                   header.width, header.height)
    n = 3 * header.height * header.width
    left = decode_image_planes(recv_exact(conn, n), header.width, header.height)
    right = decode_image_planes(recv_exact(conn, n), header.width, header.height)
    return header, calib, left, right


def send_depth_image(conn: socket.socket, seq: int, depth: np.ndarray) -> None:
    """Upload a float32 depth map (type-3 header + float32 rows)."""
    h, w = depth.shape
    conn.sendall(FrameHeader(REQ_DEPTH_UPLOAD, seq, w, h).pack())
    conn.sendall(np.ascontiguousarray(depth, dtype="<f4").tobytes())


def recv_depth_image(conn: socket.socket) -> Tuple[int, np.ndarray]:
    """Server side: type byte already consumed; read seq/size + rows
    (server.py:148-177)."""
    seq, width, height = struct.unpack("<iHH", recv_exact(conn, 8))
    img = np.frombuffer(recv_exact(conn, width * height * 4),
                        dtype="<f4").reshape(height, width)
    return seq, img.copy()
