"""OIDN-style Device/Filter API around the JAX U-Net.

Mirrors the public semantics of the reference denoiser library
(include/OpenImageDenoise/oidn.hpp, core/device.cpp, core/filter.cpp,
core/unet.cpp): a Device owns filters and error state; a Filter takes named
images + params, ``commit()`` (re)builds the network only when dirty, and
``execute()`` denoises with optional overlapped spatial tiling, progress
monitoring and cooperative cancellation.

TPU re-architecture: the oneDNN graph, blocked layouts, scratch arena and
ISPC reorders all collapse into one jitted NHWC function (pack -> U-Net ->
unpack). Tiling with the reference's 96 px overlap (unet.h:23,38) remains for
HBM-constrained images and exercises the same maxMemoryMB/progress surface.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from . import color as color_mod
from . import weights as weights_mod
from .unet import (
    UNET_ALIGNMENT,
    UNET_RECEPTIVE_FIELD,
    params_in_channels,
    round_up,
    unet_apply,
)


class OidnError(RuntimeError):
    """Error with an OIDN-style code (oidn.h Error enum)."""

    def __init__(self, code: str, message: str):
        super().__init__(message)
        self.code = code  # 'unknown'|'invalid_argument'|'invalid_operation'|
        #                   'out_of_memory'|'unsupported_hardware'|'cancelled'

    NONE = "none"
    INVALID_ARGUMENT = "invalid_argument"
    INVALID_OPERATION = "invalid_operation"
    CANCELLED = "cancelled"


MAX_IMAGE_DIM = 65536  # core/image.h max
DEFAULT_MAX_MEMORY_MB = 3000  # unet.h:38
OVERLAP = round_up(UNET_RECEPTIVE_FIELD // 2, UNET_ALIGNMENT)  # = 96 (unet.h:23)


class DeviceBuffer:
    """Device-resident image buffer — the analog of oidnNewBuffer allocating
    in *device* memory (oidn.h buffer API; apps/utils/image_io.h ImageBuffer
    allocates through the device and oidnBenchmark.cpp:121-165 times
    ``execute()`` against those buffers with no host traffic in the loop).

    Attach with ``Filter.set_image``: inputs upload once at construction and
    stay resident; an output DeviceBuffer receives the denoised result as a
    device array (``.array``) with NO device->host readback — call
    ``.numpy()`` when host bytes are actually needed. Through this
    environment's TPU tunnel a 1080p 3-image execute moves ~100 MB of
    host<->device traffic, which dwarfs the U-Net compute; device-resident
    buffers are how a real pipeline (and the reference's own benchmark)
    holds images."""

    def __init__(self, array):
        arr = jnp.asarray(array)
        if arr.dtype not in (jnp.float32, jnp.float16):
            arr = arr.astype(jnp.float32)
        self.array = arr

    @property
    def shape(self):
        return self.array.shape

    @property
    def dtype(self):
        return self.array.dtype

    @property
    def ndim(self):
        return self.array.ndim

    def numpy(self) -> np.ndarray:
        return np.asarray(self.array)


def _img_array(img):
    """Underlying array of an attached image (DeviceBuffer or ndarray)."""
    return img.array if isinstance(img, DeviceBuffer) else img

def _scratch_bytes(tile_h: int, tile_w: int, in_ch: int,
                   output_temp_bytes: int = 0) -> int:
    """Exact U-Net activation scratch size for one padded tile.

    Mirrors UNetFilter::buildNet's end-relative offset/liveness computation
    (core/unet.cpp:356-464) tensor for tensor: each activation is placed
    below the deepest tensor still live when it is produced, and the scratch
    is the deepest offset reached. Channel counts are the fixed topology
    constants (denoise/unet.py); sizes are f32 with 64-byte alignment (the
    oneDNN channel-blocking pad of the reference is an ISA detail with no
    TPU analog). ``output_temp_bytes`` adds the in-place tiled outputTemp
    image (unet.cpp:455-460).
    """
    def size(c: int, scale: int) -> int:
        return round_up(c * (tile_h // scale) * (tile_w // scale) * 4, 64)

    input_ofs = -size(in_ch, 1)
    enc0 = input_ofs - size(32, 1)
    pool1 = input_ofs - size(32, 2)
    enc1 = min(enc0, pool1) - size(32, 1)
    pool2 = pool1 - size(48, 4)
    enc2 = pool2 - size(48, 2)
    pool3 = pool2 - size(64, 8)
    enc3 = pool3 - size(64, 4)
    enc4 = pool3 - size(80, 8)
    enc5a = pool3 - size(96, 16)
    pool4 = min(enc4, enc5a) - size(80, 16)
    up4 = pool3 - size(96, 8)
    enc5b = min(enc5a, up4) - size(96, 16)
    up3 = pool2 - size(112, 4)
    dec4b = up3 - size(112, 8)
    dec4a = min(up4, dec4b) - size(112, 8)
    up2 = pool1 - size(96, 2)
    dec3b = up2 - size(96, 4)
    dec3a = min(up3, dec3b) - size(96, 4)
    up1 = input_ofs - size(64, 1)
    dec2b = up1 - size(64, 2)
    dec2a = min(up2, dec2b) - size(64, 2)
    dec1b = 0 - size(32, 1)
    dec1a = min(up1, dec1b) - size(64, 1)
    dec0 = dec1b - size(3, 1)
    min_ofs = min(enc1, enc2, enc3, pool4, enc5b,
                  dec4a, dec3a, dec2a, dec1a, dec0)
    min_ofs -= output_temp_bytes
    return -min_ofs


def _ceil_div(a: int, b: int) -> int:
    return (a + b - 1) // b


class Device:
    """oidnNewDevice + commit + error state (core/device.cpp)."""

    def __init__(self, device_type: str = "default"):
        self.device_type = device_type
        self.committed = False
        self.error: tuple[str, str] | None = None
        self.error_fn: Callable[[str, str], None] | None = None
        # Accepted-for-parity host knobs (no-ops on TPU: XLA owns threading).
        self.params = {"numThreads": 0, "setAffinity": True, "verbose": 0}

    def set(self, name: str, value) -> None:
        if name in self.params:
            self.params[name] = value
        else:
            self._warn(f"unknown device parameter '{name}'")

    def get(self, name: str):
        if name in self.params:
            return self.params[name]
        if name == "version":
            return 10402  # OIDN v1.4.2 parity surface
        raise OidnError(OidnError.INVALID_ARGUMENT, f"unknown device parameter '{name}'")

    def set_error_function(self, fn) -> None:
        self.error_fn = fn

    def commit(self) -> None:
        self.committed = True

    def get_error(self) -> tuple[str, str]:
        err = self.error or (OidnError.NONE, "")
        self.error = None
        return err

    def _record_error(self, e: OidnError) -> None:
        self.error = (e.code, str(e))
        if self.error_fn is not None:
            self.error_fn(e.code, str(e))

    def _warn(self, msg: str) -> None:
        if self.params.get("verbose", 0) > 0:
            print(f"warning: {msg}")

    def new_filter(self, kind: str) -> "Filter":
        if not self.committed:
            raise OidnError(OidnError.INVALID_OPERATION, "device not committed")
        if kind == "RT":
            return RTFilter(self)
        if kind == "RTLightmap":
            return RTLightmapFilter(self)
        raise OidnError(OidnError.INVALID_ARGUMENT, f"unknown filter type '{kind}'")


def _check_image(name: str, img):
    if img is None:
        return
    if img.ndim != 3 or img.shape[2] != 3:
        raise OidnError(OidnError.INVALID_ARGUMENT, f"image '{name}' must be HxWx3")
    if isinstance(img, DeviceBuffer):
        return  # DeviceBuffer construction already normalized the dtype
    if img.dtype not in (np.float32, np.float16):
        raise OidnError(
            OidnError.INVALID_ARGUMENT,
            f"image '{name}' must be float32 (Float3) or float16 (Half3)",
        )
    if img.shape[0] > MAX_IMAGE_DIM or img.shape[1] > MAX_IMAGE_DIM:
        raise OidnError(OidnError.INVALID_ARGUMENT, "image size too large")


def _strided_view(buffer: np.ndarray, width: int, height: int,
                  byte_offset: int, pixel_byte_stride: int,
                  row_byte_stride: int) -> np.ndarray:
    """oidnSetFilterImage's (buffer, byteOffset, pixelByteStride,
    rowByteStride) surface (core/image.h:12-66): view an arbitrary
    float16/float32 buffer as HxWx3 without copying. Stride 0 means
    tightly packed. The view is writable, so it also serves as a strided
    OUTPUT image."""
    buffer = np.ascontiguousarray(buffer) if not buffer.flags.c_contiguous else buffer
    itemsize = buffer.dtype.itemsize
    if itemsize not in (2, 4):
        raise OidnError(OidnError.INVALID_ARGUMENT, "buffer must be f16/f32")
    pixel = pixel_byte_stride or 3 * itemsize
    row = row_byte_stride or width * pixel
    for s, nm in ((pixel, "pixelByteStride"), (row, "rowByteStride"),
                  (byte_offset, "byteOffset")):
        if s % itemsize:
            raise OidnError(
                OidnError.INVALID_ARGUMENT, f"{nm} not a multiple of the format size"
            )
    end = byte_offset + (height - 1) * row + (width - 1) * pixel + 3 * itemsize
    if height > 0 and width > 0 and end > buffer.nbytes:
        raise OidnError(OidnError.INVALID_ARGUMENT, "image exceeds buffer bounds")
    flat = buffer.reshape(-1)
    return np.lib.stride_tricks.as_strided(
        flat[byte_offset // itemsize :],
        shape=(height, width, 3),
        strides=(row, pixel, itemsize),
    )


class Filter:
    """Base UNetFilter behavior (core/filter.cpp + core/unet.cpp)."""

    # subclass config
    _image_slots = ("color", "albedo", "normal", "output")
    _default_transfer = "srgb"

    def __init__(self, device: Device):
        self.device = device
        self.images: dict[str, np.ndarray | None] = {s: None for s in self._image_slots}
        self.params: dict[str, object] = {
            "hdr": False,
            "srgb": False,
            "directional": False,
            "cleanAux": False,
            "maxMemoryMB": DEFAULT_MAX_MEMORY_MB,
            "inputScale": math.nan,
            # Beyond-reference scaling knob: a jax.sharding.Mesh shards the
            # unmonitored tiled execute's tile table across devices (each
            # chip denoises its share of the tiles; one psum stitches the
            # disjoint owned regions). None = single-device. The reference's
            # only tiling parallelism is TBB threads inside one host.
            "mesh": None,
        }
        self.progress_fn: Callable[[float], bool] | None = None
        self.dirty = True
        self._committed = False
        self._params_weights = None
        self._weights_name = None
        self.using_random_weights = False
        self._user_weights_blob: bytes | None = None
        self._jitted = {}

    # -- parameter surface (oidn.hpp FilterRef) -------------------------------
    def set_image(self, name: str, image: np.ndarray | None, width=None,
                  height=None, byte_offset: int = 0, pixel_byte_stride: int = 0,
                  row_byte_stride: int = 0):
        """Attach an image. ``image`` may be an HxWx3 float32 (Float3) or
        float16 (Half3) array, or — with ``width``/``height`` given — any
        f16/f32 buffer viewed through oidn.h's byteOffset/pixelByteStride/
        rowByteStride window (core/image.h:12-66). Views alias the caller's
        buffer, so a strided 'output' writes back in place."""
        if name not in self._image_slots:
            self.device._warn(f"unknown filter image '{name}'")
            return
        if isinstance(image, DeviceBuffer):
            _check_image(name, image)
            self.images[name] = image
            self.dirty = True
            return
        if image is not None:
            image = np.asarray(image)
            if width is not None and height is not None and (
                byte_offset or pixel_byte_stride or row_byte_stride
                or image.ndim != 3 or image.shape[:2] != (height, width)
            ):
                image = _strided_view(image, width, height, byte_offset,
                                      pixel_byte_stride, row_byte_stride)
            _check_image(name, image)
        self.images[name] = image
        self.dirty = True

    def remove_image(self, name: str):
        if name in self._image_slots:
            self.images[name] = None
        self.dirty = True

    def set(self, name: str, value):
        if name in self.params:
            self.params[name] = value
            self.dirty = True
        else:
            self.device._warn(f"unknown filter parameter '{name}'")

    def get(self, name: str):
        if name == "alignment":
            return UNET_ALIGNMENT
        if name == "overlap":
            return OVERLAP
        if name in self.params:
            return self.params[name]
        raise OidnError(OidnError.INVALID_ARGUMENT, f"unknown filter parameter '{name}'")

    def set_data(self, name: str, blob: bytes):
        """setData("weights", tza_bytes) — user-provided weights override."""
        if name == "weights":
            self._user_weights_blob = bytes(blob)
            self.dirty = True
        else:
            self.device._warn(f"unknown filter data '{name}'")

    def set_progress_monitor_function(self, fn) -> None:
        self.progress_fn = fn

    # -- commit ---------------------------------------------------------------
    def _features(self) -> tuple[bool, bool, bool]:
        return (
            self.images["color"] is not None,
            self.images["albedo"] is not None,
            self.images["normal"] is not None,
        )

    def _select_weights_name(self) -> str:
        raise NotImplementedError

    def _transfer_kind(self) -> str:
        raise NotImplementedError

    def _snorm(self) -> bool:
        return False

    def commit(self) -> None:
        try:
            self._commit_impl()
        except OidnError as e:
            self.device._record_error(e)
            raise

    def _commit_impl(self) -> None:
        if not self.dirty and self._committed:
            return  # only rebuild when params materially changed (filter.cpp:14-56)
        output = self.images["output"]
        if output is None:
            raise OidnError(OidnError.INVALID_OPERATION, "output image not set")
        h, w = output.shape[:2]
        for name in ("color", "albedo", "normal"):
            img = self.images.get(name)
            if img is not None and img.shape[:2] != (h, w):
                raise OidnError(OidnError.INVALID_OPERATION, "image size mismatch")
        if self.params.get("directional") and (self.params["hdr"] or self.params["srgb"]):
            raise OidnError(
                OidnError.INVALID_OPERATION,
                "directional and hdr/srgb modes cannot be enabled at the same time",
            )
        if self.params["hdr"] and self.params["srgb"]:
            raise OidnError(
                OidnError.INVALID_OPERATION,
                "hdr and srgb modes cannot be enabled at the same time",
            )

        name = self._select_weights_name()
        if self._user_weights_blob is not None:
            params, random_w = weights_mod.load_params_from_blob(self._user_weights_blob)
        else:
            params, random_w = weights_mod.load_default_params(name)
        self._params_weights = params
        self._weights_name = name
        self.using_random_weights = random_w
        self._params_cast = None  # re-cast on next execute (weights changed)

        # validate channel count vs features
        n_in = sum(3 for f in self._features() if f)
        if n_in == 0:
            raise OidnError(
                OidnError.INVALID_OPERATION, "invalid combination of input features"
            )
        have = params_in_channels(self._params_weights)
        if have != n_in:
            raise OidnError(
                OidnError.INVALID_OPERATION,
                f"weights expect {have} input channels, features provide {n_in}",
            )

        self._plan_tiles(h, w)
        self.dirty = False
        self._committed = True

    # -- tiling (unet.cpp:199-239 computeTileSize, exact accounting) ---------
    def _output_aliases_input(self) -> bool:
        output = self.images.get("output")
        if output is None:
            return False

        def aliases(a, b) -> bool:
            if isinstance(a, DeviceBuffer) or isinstance(b, DeviceBuffer):
                # Device arrays are immutable; aliasing only matters (and is
                # only detectable) as identity of the attached buffer/array.
                return a is b or _img_array(a) is _img_array(b)
            return np.shares_memory(a, b)

        return any(
            img is not None and aliases(output, img)
            for name, img in self.images.items()
            if name != "output"
        )

    def _plan_tiles(self, h: int, w: int) -> None:
        """UNetFilter::computeTileSize: split H (then W) until the exact
        scratch size (_scratch_bytes, the buildNet liveness sum) fits the
        maxMemoryMB budget; min tile 3*overlap."""
        max_scratch = int(self.params["maxMemoryMB"]) * (1 << 20)
        min_tile = 3 * OVERLAP
        in_ch = sum(3 for f in self._features() if f)
        inplace = self._output_aliases_input()

        split_h = split_w = 1
        tile_h = round_up(h, UNET_ALIGNMENT)
        tile_w = round_up(w, UNET_ALIGNMENT)

        def counts() -> tuple:
            # Final tile counts (unet.cpp:228-230) — the one formula used
            # both for the outputTemp charge below and for self.tile_counts,
            # so the budget check can never disagree with the actual grid.
            ch = _ceil_div(h - 2 * OVERLAP, tile_h - 2 * OVERLAP) if h > tile_h else 1
            cw = _ceil_div(w - 2 * OVERLAP, tile_w - 2 * OVERLAP) if w > tile_w else 1
            return ch, cw

        def scratch() -> int:
            temp = 0
            ch, cw = counts()
            if inplace and ch * cw > 1:
                temp = round_up(3 * h * w * 4, 64)  # outputTemp, unet.cpp:455
            return _scratch_bytes(tile_h, tile_w, in_ch, temp)

        while scratch() > max_scratch:
            if tile_h > min_tile and tile_h > tile_w:
                split_h += 1
                tile_h = max(
                    round_up(_ceil_div(h - 2 * OVERLAP, split_h),
                             UNET_ALIGNMENT) + 2 * OVERLAP,
                    min_tile,
                )
            elif tile_w > min_tile:
                split_w += 1
                tile_w = max(
                    round_up(_ceil_div(w - 2 * OVERLAP, split_w),
                             UNET_ALIGNMENT) + 2 * OVERLAP,
                    min_tile,
                )
            else:
                break

        self.tile_shape = (tile_h, tile_w)
        self.tile_counts = counts()

    def _tile_grid(self, h: int, w: int):
        """Reference-shaped tile list [(oh, ow, out_h, out_w)]: output-region
        origin and extent per tile, enumerated exactly like the execute()
        loop of core/unet.cpp:149-186 (interior tiles own tile-2*overlap
        rows/cols; border tiles keep their outer halo as output)."""
        tile_h, tile_w = self.tile_shape
        count_h, count_w = self.tile_counts
        tiles = []
        for i in range(count_h):
            hin = i * (tile_h - 2 * OVERLAP)
            beg_h = OVERLAP if i > 0 else 0
            end_h = OVERLAP if i < count_h - 1 else 0
            th1 = min(h - hin, tile_h)
            out_h = th1 - beg_h - end_h
            for j in range(count_w):
                win = j * (tile_w - 2 * OVERLAP)
                beg_w = OVERLAP if j > 0 else 0
                end_w = OVERLAP if j < count_w - 1 else 0
                tw1 = min(w - win, tile_w)
                out_w = tw1 - beg_w - end_w
                tiles.append((hin + beg_h, win + beg_w, out_h, out_w))
        return tiles

    # -- execute ---------------------------------------------------------------
    def execute(self) -> None:
        try:
            self._execute_impl()
        except OidnError as e:
            self.device._record_error(e)
            raise

    def _progress(self, done: float) -> None:
        if self.progress_fn is not None:
            if not self.progress_fn(min(max(done, 0.0), 1.0)):
                raise OidnError(OidnError.CANCELLED, "execution was cancelled")

    def _execute_impl(self) -> None:
        if self.dirty or not self._committed:
            self._commit_impl()
        output = self.images["output"]
        h, w = output.shape[:2]
        self._progress(0.0)
        if h == 0 or w == 0:
            self._progress(1.0)
            return

        # input scale: user inputScale, else autoexposure for HDR (unet.cpp:134-144)
        scale = self.params["inputScale"]
        if isinstance(scale, float) and math.isnan(scale):
            if self.params["hdr"] and self.images["color"] is not None:
                scale = float(color_mod.autoexposure(
                    jnp.asarray(_img_array(self.images["color"]), jnp.float32)
                ))
            else:
                scale = 1.0
        transfer = color_mod.make_transfer(self._transfer_kind(), float(scale))

        # Device-resident fast path: when no per-tile progress callback is
        # registered, each input uploads ONCE and every tile is sliced and
        # denoised on device in a single scanned program, with one transfer
        # back — the per-tile host round-trips of the monitored path cost
        # ~34 ms each through this environment's TPU tunnel and dominated
        # standalone execute() wall time (docs/MESH_TIERS.md "host sync").
        if self.progress_fn is None:
            self._execute_device(h, w, transfer)
            return

        tiles = self._tile_grid(h, w)
        n_tiles = len(tiles)
        # Monitored path with DeviceBuffers: per-tile progress requires host
        # round-trips anyway, so materialize resident inputs once and write
        # a host canvas; the output DeviceBuffer gets the stitched result
        # put back at the end. (Unmonitored executes never take this path.)
        host_images = None
        if any(isinstance(i, DeviceBuffer) for i in self.images.values()
               if i is not None):
            host_images = {
                # np.asarray of a device array is read-only; the output
                # canvas must be writable.
                n: (np.array(i.numpy(), copy=True) if n == "output"
                    else i.numpy()) if isinstance(i, DeviceBuffer) else i
                for n, i in self.images.items()
            }
        # In-place + tiled: later tiles must read input pixels the earlier
        # tiles would have overwritten, so route writes through a temp and
        # copy once at the end — the outputTemp/outputCopy path of
        # core/unet.cpp:455-460,187-189. Single-tile in-place writes direct
        # (the tile pipeline reads its whole input window before writing).
        dest = host_images["output"] if host_images is not None else output
        if self._output_aliases_input() and n_tiles > 1:
            dest = np.zeros((h, w) + output.shape[2:],
                            np.float32 if host_images is not None
                            else output.dtype)
        done = 0
        for oh, ow, out_h, out_w in tiles:
            self._run_tile(oh, ow, out_h, out_w, h, w, transfer, dest,
                           images=host_images)
            done += 1
            self._progress(done / n_tiles)
        if host_images is not None:
            if isinstance(output, DeviceBuffer):
                output.array = jnp.asarray(dest, output.array.dtype)
            elif dest is not host_images["output"]:
                output[...] = dest
        elif dest is not output:
            output[...] = dest  # outputCopy (unet.cpp:187-189)
        self._progress(1.0)

    def _stacked_inputs(self, h: int, w: int):
        """(names, [h,w,C] f32 channel stack) of the present input images.

        All-host inputs stack on the host (one upload downstream). If ANY
        input is a DeviceBuffer the stack is composed on DEVICE so resident
        planes never round-trip through the host."""
        imgs = [(n, self.images.get(n)) for n in ("color", "albedo", "normal")]
        imgs = [(n, i) for n, i in imgs if i is not None]
        names = tuple(n for n, _ in imgs)
        if any(isinstance(i, DeviceBuffer) for _, i in imgs):
            planes = [jnp.asarray(_img_array(i), jnp.float32) for _, i in imgs]
            return names, jnp.concatenate(planes, axis=-1)
        planes = [np.ascontiguousarray(i, dtype=np.float32) for _, i in imgs]
        return names, np.concatenate(planes, axis=-1)

    def _execute_device(self, h: int, w: int, transfer) -> None:
        """One-dispatch tiled execute: inputs resident, tiles sliced and
        stitched on device (lax.scan over the _tile_grid tiles), one
        readback. Tile windows, zero fill, and output ownership match the
        monitored per-tile path (_run_tile) exactly, so registering a
        progress monitor does not change the output pixels. In-place is
        safe without outputTemp: every input pixel is read on device
        before the single host-side write.
        """
        output = self.images["output"]
        names, stacked = self._stacked_inputs(h, w)
        tile_h, tile_w = self.tile_shape
        hdr = bool(self.params["hdr"])
        snorm = self._snorm()
        has_color = self.images["color"] is not None

        if tile_h >= round_up(h, UNET_ALIGNMENT) and tile_w >= round_up(w, UNET_ALIGNMENT):
            # Single tile: the whole image is the window (the jitted tile
            # pipeline pads to alignment internally).
            out_dev = self._tile_pipeline(names, hdr, snorm, has_color)(
                self._cast_params(), jnp.asarray(stacked),
                jnp.float32(transfer.input_scale),
            )
            self._write_output(output, out_dev, h, w)
            self._progress(1.0)
            return

        # Multi-tile: reproduce the monitored path tile for tile — the same
        # _tile_grid output regions and the same re-anchored full-size input
        # windows as _run_tile — in ONE scanned device program. Windows are
        # sliced from a zero-padded copy; the zero fill is only ever the
        # alignment band beyond the image, exactly like _run_tile's zeroed
        # window array.
        count_h, count_w = self.tile_counts
        step_h = tile_h - 2 * OVERLAP
        step_w = tile_w - 2 * OVERLAP
        tiles = self._tile_grid(h, w)
        ih0s, iw0s, ohs, ows = [], [], [], []
        for oh, ow, _out_h, _out_w in tiles:
            ih0 = max(oh - OVERLAP, 0)
            iw0 = max(ow - OVERLAP, 0)
            ih1 = min(ih0 + tile_h, h)
            iw1 = min(iw0 + tile_w, w)
            ih0 = max(min(ih0, ih1 - tile_h), 0)  # re-anchor (as _run_tile)
            iw0 = max(min(iw0, iw1 - tile_w), 0)
            ih0s.append(ih0)
            iw0s.append(iw0)
            ohs.append(oh)
            ows.append(ow)
        vh0s = [oh - i0 for oh, i0 in zip(ohs, ih0s)]
        vw0s = [ow - i0 for ow, i0 in zip(ows, iw0s)]
        # Owned band per tile: leading-anchored static extent (owned region
        # plus up to OVERLAP of trailing excess). Writes go in _tile_grid's
        # ascending row-major order, so the LAST writer of every pixel is
        # its _tile_grid owner: a tile's trailing excess is overwritten by
        # the next tile's band or cropped at h/w.
        band_h = tile_h if count_h == 1 else step_h + OVERLAP
        band_w = tile_w if count_w == 1 else step_w + OVERLAP
        pad_y_h = max(0, max(v + band_h for v in vh0s) - tile_h)
        pad_y_w = max(0, max(v + band_w for v in vw0s) - tile_w)
        in_h, in_w = max(h, tile_h), max(w, tile_w)
        out_pad = (max(oh + band_h for oh in ohs),
                   max(ow + band_w for ow in ows))
        if isinstance(stacked, jnp.ndarray):
            # device-resident stack: pad on device (no host round-trip)
            padded = jnp.zeros((in_h, in_w, stacked.shape[-1]),
                               jnp.float32).at[:h, :w].set(stacked)
        else:
            padded = np.zeros((in_h, in_w, stacked.shape[-1]), np.float32)
            padded[:h, :w] = stacked
        # Exact owned extents per tile (th, tw): band writes are masked to
        # them, so every output pixel has exactly ONE writer — order-free,
        # which is what lets the mesh path psum per-device canvases.
        ths = [t[2] for t in tiles]
        tws = [t[3] for t in tiles]
        idx = np.stack(
            [np.asarray(a, np.int32)
             for a in (ih0s, iw0s, vh0s, vw0s, ohs, ows, ths, tws)], axis=1)
        mesh = self.params.get("mesh")
        if mesh is not None:
            # Pad the tile table to a multiple of the mesh size with no-op
            # rows (th=tw=0 writes nothing); each device scans its share.
            n_dev = mesh.devices.size
            pad_rows = (-len(idx)) % n_dev
            if pad_rows:
                idx = np.concatenate(
                    [idx, np.zeros((pad_rows, idx.shape[1]), np.int32)])
        run = self._grid_pipeline(
            names, hdr, snorm, has_color, (in_h, in_w),
            (band_h, band_w), (pad_y_h, pad_y_w), out_pad, mesh)
        out_dev = run(
            self._cast_params(), jnp.asarray(padded), jnp.asarray(idx),
            jnp.float32(transfer.input_scale),
        )
        self._write_output(output, out_dev, h, w)
        self._progress(1.0)

    @staticmethod
    def _write_output(output, out_dev, h: int, w: int) -> None:
        """Deliver a device result: a DeviceBuffer output swaps in the
        device array (no readback — oidnBenchmark semantics, buffers live on
        the device); an ndarray output reads back and writes in place."""
        if isinstance(output, DeviceBuffer):
            output.array = out_dev[:h, :w].astype(output.array.dtype)
        else:
            output[...] = np.asarray(out_dev)[:h, :w]

    def _grid_pipeline(self, names, hdr, snorm, has_color, in_shape, band,
                       y_pad, out_pad, mesh=None):
        """Jitted whole-grid execute for one (inputs, tiling) configuration:
        lax.scan over the per-tile (window origin, in-window output offset,
        output origin, owned extent) table; each step slices a re-anchored
        window, runs pack -> U-Net -> unpack, and writes its owned region
        EXACTLY (band slice masked to the tile's out_h/out_w) — every output
        pixel has one writer, so tile order is free.

        With ``mesh`` (the filter's "mesh" param), the table is sharded over
        the mesh's first axis via shard_map: each device scans its share of
        the tiles into a private canvas and one ``psum`` stitches the
        disjoint regions — multi-chip denoise throughput the reference's
        TBB-threaded tiling cannot reach beyond one host."""
        key = (names, hdr, snorm, has_color, self.tile_shape, in_shape,
               band, y_pad, out_pad, self._transfer_kind(), mesh)
        fn = self._jitted.get(key)
        if fn is not None:
            return fn
        transfer_kind = self._transfer_kind()
        dtype = self._network_dtype()
        tile_h, tile_w = self.tile_shape
        band_h, band_w = band
        pad_y_h, pad_y_w = y_pad

        def scan_tiles(params, padded, idx, input_scale, vary=lambda a: a):
            tf = color_mod.make_transfer(transfer_kind, input_scale)
            c = padded.shape[-1]

            def body(out, row):
                ih0, iw0, vh0, vw0, oh, ow, th, tw = (row[k] for k in range(8))
                window = jax.lax.dynamic_slice(
                    padded, (ih0, iw0, 0), (tile_h, tile_w, c))
                x = _pack_input(names, window, tf, hdr, snorm, has_color)
                y = unet_apply(params, x.astype(dtype)[None])[0]
                y = _unpack_output(y.astype(jnp.float32), tf, hdr, snorm)
                if pad_y_h or pad_y_w:
                    # Room for the band slice on short last-tile offsets;
                    # padded rows/cols only ever land in the cropped region.
                    y = jnp.pad(y, ((0, pad_y_h), (0, pad_y_w), (0, 0)))
                core = jax.lax.dynamic_slice(
                    y, (vh0, vw0, 0), (band_h, band_w, 3))
                # Mask the write to the exact owned extent (read-modify-
                # write); a th=tw=0 row is a no-op (mesh padding rows).
                cur = jax.lax.dynamic_slice(
                    out, (oh, ow, 0), (band_h, band_w, 3))
                ri = jax.lax.broadcasted_iota(jnp.int32, (band_h, band_w, 3), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (band_h, band_w, 3), 1)
                core = jnp.where((ri < th) & (ci < tw), core, cur)
                return jax.lax.dynamic_update_slice(out, core, (oh, ow, 0)), None

            # vary: under shard_map the carry depends on the device's idx
            # shard, so the init must be pcast to varying (as in
            # parallel/sharded.py render_multichip_sample).
            out0 = vary(jnp.zeros(out_pad + (3,), jnp.float32))
            out, _ = jax.lax.scan(body, out0, idx)
            return out

        if mesh is None:
            run = jax.jit(scan_tiles)
        else:
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]

            vary = lambda a: jax.lax.pcast(a, axis, to="varying")

            @jax.jit
            def run(params, padded, idx, input_scale):
                shard = jax.shard_map(
                    lambda p, img, rows, s: jax.lax.psum(
                        scan_tiles(p, img, rows, s, vary=vary), axis),
                    mesh=mesh,
                    in_specs=(P(), P(), P(axis), P()),
                    out_specs=P(),
                )
                return shard(params, padded, idx, input_scale)

        self._jitted[key] = run
        return run

    def _run_tile(self, oh, ow, out_h, out_w, h, w, transfer, output,
                  images=None) -> None:
        """Denoise one tile; write its [oh:oh+out_h, ow:ow+out_w] output
        region (the reference's outputReorder->setTile, unet.cpp:168-176).
        ``images`` overrides self.images (host materializations of
        DeviceBuffer inputs on the monitored path)."""
        if images is None:
            images = self.images
        tile_h, tile_w = self.tile_shape
        # Input window (with overlap), clamped to the image.
        ih0 = max(oh - OVERLAP, 0)
        iw0 = max(ow - OVERLAP, 0)
        ih1 = min(ih0 + tile_h, h)
        iw1 = min(iw0 + tile_w, w)
        # Re-anchor so the window is as large as possible (border tiles).
        ih0 = max(min(ih0, ih1 - tile_h), 0)
        iw0 = max(min(iw0, iw1 - tile_w), 0)

        planes = []
        snorm = self._snorm()
        hdr = bool(self.params["hdr"])
        has_color = images["color"] is not None
        for name in ("color", "albedo", "normal"):
            img = images.get(name)
            if img is None:
                continue
            window = np.zeros((tile_h, tile_w, 3), np.float32)
            window[: ih1 - ih0, : iw1 - iw0] = img[ih0:ih1, iw0:iw1]
            planes.append((name, window))

        # ONE device program per tile: pack (sanitize+transfer) -> pad ->
        # U-Net -> unpack. Anything less fuses poorly: eager per-op dispatch
        # dominated execute() time before this.
        names = tuple(name for name, _ in planes)
        stacked = np.concatenate([wdw for _, wdw in planes], axis=-1)
        out_np = np.asarray(
            self._tile_pipeline(names, hdr, snorm, has_color)(
                self._cast_params(),
                jnp.asarray(stacked),
                jnp.float32(transfer.input_scale),
            )
        )

        # This tile's output region inside the computed window.
        vh0 = oh - ih0  # offset of output rows inside the tile
        vw0 = ow - iw0
        vh1 = min(vh0 + out_h, ih1 - ih0)
        vw1 = min(vw0 + out_w, iw1 - iw0)
        output[oh : oh + (vh1 - vh0), ow : ow + (vw1 - vw0)] = out_np[vh0:vh1, vw0:vw1]

    def _network_dtype(self):
        """bf16 on TPU (MXU-native, ~8x f32 conv throughput); f32 on CPU."""
        return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16

    def _cast_params(self):
        dtype = self._network_dtype()
        if getattr(self, "_params_cast", None) is None or self._params_cast_dtype != dtype:
            self._params_cast = jax.tree.map(
                lambda a: a.astype(dtype), self._params_weights
            )
            self._params_cast_dtype = dtype
        return self._params_cast

    def _tile_pipeline(self, names, hdr, snorm, has_color):
        """Jitted pack->pad->U-Net->unpack for one tile configuration."""
        key = (names, hdr, snorm, has_color, self.tile_shape, self._transfer_kind())
        fn = self._jitted.get(key)
        if fn is not None:
            return fn
        transfer_kind = self._transfer_kind()
        dtype = self._network_dtype()

        @jax.jit
        def run(params, stacked, input_scale):
            tf = color_mod.make_transfer(transfer_kind, input_scale)
            x = _pack_input(names, stacked, tf, hdr, snorm, has_color)
            th, tw = x.shape[0], x.shape[1]
            hp = round_up(max(th, 1), UNET_ALIGNMENT)
            wp = round_up(max(tw, 1), UNET_ALIGNMENT)
            xp = jnp.zeros((hp, wp, x.shape[2]), dtype).at[:th, :tw].set(x.astype(dtype))
            y = unet_apply(params, xp[None])[0].astype(jnp.float32)[:th, :tw]
            return _unpack_output(y, tf, hdr, snorm)

        self._jitted[key] = run
        return run


def _pack_input(names, stacked, transfer, hdr, snorm, has_color):
    """Input packing + sanitize (core/input_reorder.ispc:28-151)."""
    chans = []
    idx = 0
    for name in names:
        v = stacked[..., idx : idx + 3]
        idx += 3
        if name == "color":
            v = v * transfer.input_scale
            v = color_mod.sanitize(v, -1.0 if snorm else 0.0, jnp.inf if hdr else 1.0)
            if snorm:
                v = v * 0.5 + 0.5
            v = transfer.forward(v)
        elif name == "albedo":
            if not has_color:
                v = v * transfer.input_scale
            v = color_mod.sanitize(v, 0.0, 1.0)
            if not has_color:
                v = transfer.forward(v)
        elif name == "normal":
            if not has_color:
                v = v * transfer.input_scale
            v = color_mod.sanitize(v, -1.0, 1.0)
            v = v * 0.5 + 0.5
        chans.append(v)
    return jnp.concatenate(chans, axis=-1)


def _unpack_output(y, transfer, hdr, snorm):
    """Output sanitize + inverse transfer (core/output_reorder.ispc:26-61)."""
    v = color_mod.sanitize(y, 0.0, jnp.inf)
    v = transfer.inverse(v)
    if snorm:
        v = jnp.maximum(v * 2.0 - 1.0, -1.0)
    if not hdr:
        v = jnp.minimum(v, 1.0)
    return v * transfer.output_scale


class RTFilter(Filter):
    """The "RT" ray-tracing denoiser (core/unet.cpp:613-687)."""

    def _select_weights_name(self) -> str:
        color, albedo, normal = self._features()
        hdr = bool(self.params["hdr"])
        clean = bool(self.params["cleanAux"])
        if color:
            if not albedo and not normal:
                return "rt_hdr" if hdr else "rt_ldr"
            if albedo and not normal:
                return "rt_hdr_alb" if hdr else "rt_ldr_alb"
            if albedo and normal:
                if clean:
                    return "rt_hdr_calb_cnrm" if hdr else "rt_ldr_calb_cnrm"
                return "rt_hdr_alb_nrm" if hdr else "rt_ldr_alb_nrm"
            raise OidnError(
                OidnError.INVALID_OPERATION, "invalid combination of input features"
            )
        if albedo and not normal:
            if hdr:
                raise OidnError(
                    OidnError.INVALID_OPERATION,
                    "hdr mode is not supported for albedo filtering",
                )
            return "rt_alb"
        if normal and not albedo:
            if hdr or self.params["srgb"]:
                raise OidnError(
                    OidnError.INVALID_OPERATION,
                    "hdr and srgb modes are not supported for normal filtering",
                )
            return "rt_nrm"
        raise OidnError(
            OidnError.INVALID_OPERATION, "invalid combination of input features"
        )

    def _transfer_kind(self) -> str:
        # unet.cpp:613-621
        color, _, normal = self._features()
        if self.params["srgb"] or (not color and normal):
            return "linear"
        if self.params["hdr"]:
            return "pu"
        return "srgb"

    def _snorm(self) -> bool:
        color, _, normal = self._features()
        return not color and normal


class RTLightmapFilter(Filter):
    """The "RTLightmap" filter (core/unet.cpp:693-763): hdr -> Log transfer;
    directional -> snorm linear."""

    _image_slots = ("color", "output")

    def __init__(self, device: Device):
        super().__init__(device)
        self.params["hdr"] = True

    def set(self, name, value):
        if name == "directional":
            self.params["directional"] = bool(value)
            self.params["hdr"] = not bool(value)
            self.dirty = True
            return
        super().set(name, value)

    def _features(self):
        return (self.images["color"] is not None, False, False)

    def _select_weights_name(self) -> str:
        if self.images["color"] is None:
            raise OidnError(OidnError.INVALID_OPERATION, "color image not set")
        return "rtlightmap_dir" if self.params["directional"] else "rtlightmap_hdr"

    def _transfer_kind(self) -> str:
        return "linear" if self.params["directional"] else "log"

    def _snorm(self) -> bool:
        return bool(self.params["directional"])
