"""Spatially tiled VAE encode/decode with overlap blending.

The reference relies on diffusers' ``enable_tiling``/``enable_slicing`` for
VAE memory relief (``pipeline_hunyuan_video_image2video_lowpass.py:601-628``);
at 720p×129 frames a whole-clip decode would hold ~30 GB of activations. This
is the TPU equivalent: decode overlapping latent tiles through the jitted
decoder and linear-blend the seams, with diffusers' ``tiled_decode`` assembly:

    tile rows at stride S with tile size T (overlap T−S);
    each tile blends its top edge with the tile above and its left edge with
    the tile to its left:  out[i] = prev[S+i]·(1 − i/O) + cur[i]·(i/O);
    tiles are cropped to the stride and concatenated; the result is cropped
    to the exact output size.

Edge tiles may be smaller — at most 4 distinct shapes reach the decoder
(interior / right edge / bottom edge / corner), each compiled once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def blend_v(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Blend ``a``'s bottom rows into ``b``'s top rows (H = axis 2 of
    channels-last [B, F, H, W, C])."""
    extent = min(a.shape[2], b.shape[2], extent)
    t = (jnp.arange(extent, dtype=jnp.float32) / extent)[None, None, :, None, None]
    top = a[:, :, -extent:].astype(jnp.float32) * (1 - t) + b[:, :, :extent].astype(jnp.float32) * t
    return jnp.concatenate([top.astype(b.dtype), b[:, :, extent:]], axis=2)


def blend_h(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    extent = min(a.shape[3], b.shape[3], extent)
    t = (jnp.arange(extent, dtype=jnp.float32) / extent)[None, None, None, :, None]
    left = a[:, :, :, -extent:].astype(jnp.float32) * (1 - t) + b[:, :, :, :extent].astype(jnp.float32) * t
    return jnp.concatenate([left.astype(b.dtype), b[:, :, :, extent:]], axis=3)


def _decode_tiles_sharded(decode_fn, tiles, mesh):
    """Decode a list of SAME-SHAPE tiles with the tile axis sharded over all
    ``mesh`` devices (latent parallelism for the decode stage: tiles are
    independent overlapping windows, so the grid spreads embarrassingly over
    the chips; the count pads up by replicating the last tile). Each shard
    runs ``lax.map`` over its local tiles — every tile goes through exactly
    the sequential path's decode function."""
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = mesh.devices.reshape(-1)
    n = len(devs)
    t = len(tiles)
    pad = (-t) % n
    stacked = jnp.stack(list(tiles) + [tiles[-1]] * pad)
    tile_mesh = Mesh(devs, ("tiles",))
    stacked = jax.device_put(stacked, NamedSharding(tile_mesh, P("tiles")))
    fn = shard_map(
        lambda ts: jax.lax.map(decode_fn, ts),
        mesh=tile_mesh,
        in_specs=P("tiles"),
        out_specs=P("tiles"),
        check_vma=False,
    )
    out = jax.jit(fn)(stacked)
    return [out[i] for i in range(t)]


def tiled_decode(
    decode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    z: jnp.ndarray,  # [B, F', h, w, C] latent (channels-last)
    spatial_scale: int,
    tile_latent: int = 32,
    stride_latent: int = 24,
    mesh=None,
) -> jnp.ndarray:
    """Decode ``z`` in overlapping ``tile_latent``² windows. Returns the
    assembled [B, F, h·scale, w·scale, 3] video.

    With a ``mesh``, same-shape tile groups decode with the tile grid sharded
    over ALL mesh devices (``_decode_tiles_sharded``) — a 720p Hunyuan clip
    has 28 tiles, so an 8-chip mesh cuts the decode stage ~7×; numerics equal
    the sequential path (each tile runs the same decode function)."""
    b, f, h, w, c = z.shape
    if h <= tile_latent and w <= tile_latent:
        return decode_fn(z)

    overlap_px = (tile_latent - stride_latent) * spatial_scale
    stride_px = stride_latent * spatial_scale

    coords = [
        (i, j) for i in range(0, h, stride_latent) for j in range(0, w, stride_latent)
    ]
    tiles_z = {
        (i, j): z[:, :, i : i + tile_latent, j : j + tile_latent] for (i, j) in coords
    }
    decoded = {}
    if mesh is not None and len(coords) > 1:
        # group by latent shape (interior / right edge / bottom edge / corner)
        groups: dict = {}
        for cd in coords:
            groups.setdefault(tiles_z[cd].shape, []).append(cd)
        for shape_coords in groups.values():
            if len(shape_coords) == 1:
                cd = shape_coords[0]
                decoded[cd] = decode_fn(tiles_z[cd])
                continue
            outs = _decode_tiles_sharded(
                decode_fn, [tiles_z[cd] for cd in shape_coords], mesh
            )
            decoded.update(zip(shape_coords, outs))
    else:
        for cd in coords:
            decoded[cd] = decode_fn(tiles_z[cd])

    rows = []
    for i in range(0, h, stride_latent):
        rows.append([decoded[(i, j)] for j in range(0, w, stride_latent)])

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend_v(rows[i - 1][j], tile, overlap_px)
            if j > 0:
                tile = blend_h(row[j - 1], tile, overlap_px)
            result_row.append(tile[:, :, :stride_px, :stride_px])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    out = jnp.concatenate(result_rows, axis=2)
    return out[:, :, : h * spatial_scale, : w * spatial_scale]


def auto_tile_encode(num_frames: int, h_px: int, w_px: int, override=None) -> bool:
    """Encode-side tiling policy.

    ``override`` is the pipeline's explicit ``vae_encode_tiling`` setting (the
    analog of the reference's ``enable_vae_tiling`` toggle,
    ``pipeline_hunyuan_video_image2video_lowpass.py:601-628``): True/False wins
    outright. With ``override=None`` the auto rule tiles only when untiled
    encode is an actual HBM risk: multi-frame clips past ~8 frames of 480p
    (encoder stage-1 holds 128 fp32 channels at full resolution, so an 81-frame
    480×832 Wan condition video is ~16 GB of activations). Single-frame
    conditioning encodes — including 720p — always stay untiled, because tiled
    encode is not bitwise-equal to untiled and conditioning latents must match
    the reference."""
    if override is not None:
        return bool(override)
    return num_frames > 1 and num_frames * h_px * w_px > 8 * 480 * 720


def tiled_encode(
    encode_fn: Callable,
    x: jnp.ndarray,  # [B, F, H, W, C] pixels (channels-last)
    spatial_scale: int,
    tile_px: int = 256,
    stride_px: int = 192,
):
    """Encode ``x`` in overlapping ``tile_px``² pixel windows and blend the
    latent seams (diffusers ``tiled_encode`` assembly, mirroring
    :func:`tiled_decode`). ``encode_fn`` may return any pytree of latents
    with layout [B, F', h, w, K] (e.g. the ``(mean, logvar)`` moments) — every
    leaf is blended and cropped identically, so the posterior draw happens on
    the assembled moments exactly as in the untiled path.

    Reference relief analog: ``pipeline_hunyuan_video_image2video_lowpass.py
    :601-628`` (enable_tiling covers encode as well as decode)."""
    b, f, h, w, c = x.shape
    if h <= tile_px and w <= tile_px:
        return encode_fn(x)

    overlap_lat = (tile_px - stride_px) // spatial_scale
    stride_lat = stride_px // spatial_scale

    rows = []
    for i in range(0, h, stride_px):
        row = []
        for j in range(0, w, stride_px):
            row.append(encode_fn(x[:, :, i : i + tile_px, j : j + tile_px]))
        rows.append(row)

    tmap = jax.tree_util.tree_map
    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = tmap(lambda a, b: blend_v(a, b, overlap_lat), rows[i - 1][j], tile)
            if j > 0:
                tile = tmap(lambda a, b: blend_h(a, b, overlap_lat), row[j - 1], tile)
            result_row.append(tmap(lambda t: t[:, :, :stride_lat, :stride_lat], tile))
        result_rows.append(
            tmap(lambda *ts: jnp.concatenate(ts, axis=3), *result_row)
        )
    out = tmap(lambda *ts: jnp.concatenate(ts, axis=2), *result_rows)
    h_lat, w_lat = -(-h // spatial_scale), -(-w // spatial_scale)
    return tmap(lambda t: t[:, :, :h_lat, :w_lat], out)
