"""GGUF checkpoint reader/writer (llama.cpp wire format).

Reads real llama.cpp model files straight into this engine: the GGUF
container (header, typed metadata KVs, tensor directory, aligned data) plus
the GGML block codecs, converted to this package's planar oracle layout
(``oracle/quant.py``) and then to device ``QuantLinear`` tensors.

This is the production counterpart of the reference's ad-hoc `.tensor`
dump loader (/root/reference/src/utils.h:104-150) — same role (bring model
tensors captured by llama.cpp into the engine), industrial format.

Wire layouts implemented (GGML block structs -> planar):
    Q8_0  34 B / 32 elems:  f16 d | 32x i8
    Q4_0  18 B / 32 elems:  f16 d | 16 B nibbles (lo=elem i, hi=elem i+16)
    Q4_K 144 B / 256 elems: f16 d | f16 dmin | 12 B packed 6-bit sc/mn |
                            128 B nibbles (per-64 chunk: lo=i, hi=i+32)
    Q6_K 210 B / 256 elems: 128 B ql | 64 B qh | 16x i8 scales | f16 d
    F32 / F16 / BF16 passthrough.

GGUF dims note: ne[0] is the contiguous (fastest) axis, so the numpy shape
is ``reversed(ne)`` and quantization blocks run along the last numpy axis —
matching this package's output-major [N, K] convention.

A writer is included (``write_gguf``) so tests can synthesize round-trip
checkpoints without network access and exports interoperate with llama.cpp.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Any, BinaryIO

import numpy as np

from ggml_cuda_experiments_tpu.oracle import quant as q

GGUF_MAGIC = 0x46554747          # "GGUF" little-endian
GGUF_VERSION = 3
ALIGNMENT_KEY = "general.alignment"
DEFAULT_ALIGNMENT = 32

# GGML tensor dtypes (ggml.h enum ggml_type)
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q8_0 = 2, 8
GGML_Q4_K, GGML_Q6_K = 12, 14
GGML_BF16 = 30

_TYPE_NAME = {GGML_F32: "f32", GGML_F16: "f16", GGML_BF16: "bf16",
              GGML_Q4_0: "q4_0", GGML_Q8_0: "q8_0", GGML_Q4_K: "q4_k",
              GGML_Q6_K: "q6_k"}
_NAME_TYPE = {v: k for k, v in _TYPE_NAME.items()}

# (block_elems, block_bytes)
_BLOCK = {GGML_F32: (1, 4), GGML_F16: (1, 2), GGML_BF16: (1, 2),
          GGML_Q4_0: (32, 18), GGML_Q8_0: (32, 34),
          GGML_Q4_K: (256, 144), GGML_Q6_K: (256, 210)}

# GGUF metadata value types
_VT_U8, _VT_I8, _VT_U16, _VT_I16 = 0, 1, 2, 3
_VT_U32, _VT_I32, _VT_F32, _VT_BOOL = 4, 5, 6, 7
_VT_STR, _VT_ARR, _VT_U64, _VT_I64, _VT_F64 = 8, 9, 10, 11, 12

_SCALAR_FMT = {_VT_U8: "<B", _VT_I8: "<b", _VT_U16: "<H", _VT_I16: "<h",
               _VT_U32: "<I", _VT_I32: "<i", _VT_F32: "<f", _VT_BOOL: "<?",
               _VT_U64: "<Q", _VT_I64: "<q", _VT_F64: "<d"}


@dataclasses.dataclass
class GGUFTensorInfo:
    name: str
    shape: tuple[int, ...]       # numpy order (reversed ne)
    ggml_type: int
    offset: int                  # relative to data section start

    @property
    def type_name(self) -> str:
        return _TYPE_NAME.get(self.ggml_type, f"type{self.ggml_type}")

    @property
    def nbytes(self) -> int:
        be, bb = _BLOCK[self.ggml_type]
        n = int(np.prod(self.shape)) if self.shape else 1
        assert n % be == 0, (self.name, self.shape, self.type_name)
        return n // be * bb


@dataclasses.dataclass
class GGUFFile:
    path: str
    metadata: dict[str, Any]
    tensors: dict[str, GGUFTensorInfo]
    data_offset: int

    def raw(self, name: str) -> np.ndarray:
        """The tensor's raw block bytes (memory-mapped, zero-copy)."""
        info = self.tensors[name]
        mm = np.memmap(self.path, np.uint8, "r",
                       offset=self.data_offset + info.offset,
                       shape=(info.nbytes,))
        return mm

    def load(self, name: str):
        """Decode a tensor to its planar oracle form (Q8_0 / Q4_0 / Q4_K
        dataclasses) or a float32/16 ndarray."""
        info = self.tensors[name]
        return decode_tensor(self.raw(name), info.ggml_type, info.shape)


# ---------------------------------------------------------------------------
# low-level read
# ---------------------------------------------------------------------------

def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _read_value(f: BinaryIO, vt: int):
    if vt in _SCALAR_FMT:
        fmt = _SCALAR_FMT[vt]
        (v,) = struct.unpack(fmt, f.read(struct.calcsize(fmt)))
        return v
    if vt == _VT_STR:
        return _read_str(f)
    if vt == _VT_ARR:
        (et, n) = struct.unpack("<IQ", f.read(12))
        if et in _SCALAR_FMT:
            fmt = _SCALAR_FMT[et][1:]
            sz = struct.calcsize("<" + fmt)
            buf = f.read(sz * n)
            return list(struct.unpack(f"<{n}{fmt}", buf)) if n else []
        return [_read_value(f, et) for _ in range(n)]
    raise ValueError(f"unknown GGUF value type {vt}")


def read_gguf(path: str) -> GGUFFile:
    """Parse header, metadata, and tensor directory (data stays on disk,
    memory-mapped per tensor)."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<II", f.read(8))
        assert magic == GGUF_MAGIC, f"{path}: not a GGUF file"
        assert version in (2, 3), f"unsupported GGUF version {version}"
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))

        metadata: dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_str(f)
            (vt,) = struct.unpack("<I", f.read(4))
            metadata[key] = _read_value(f, vt)

        tensors: dict[str, GGUFTensorInfo] = {}
        for _ in range(n_tensors):
            name = _read_str(f)
            (nd,) = struct.unpack("<I", f.read(4))
            ne = struct.unpack(f"<{nd}Q", f.read(8 * nd))
            ggml_type, offset = struct.unpack("<IQ", f.read(12))
            tensors[name] = GGUFTensorInfo(
                name=name, shape=tuple(reversed([int(x) for x in ne])),
                ggml_type=ggml_type, offset=int(offset))

        align = int(metadata.get(ALIGNMENT_KEY, DEFAULT_ALIGNMENT))
        pos = f.tell()
        data_offset = (pos + align - 1) // align * align
    return GGUFFile(path=path, metadata=metadata, tensors=tensors,
                    data_offset=data_offset)


# ---------------------------------------------------------------------------
# block codecs: GGML wire -> planar oracle
# ---------------------------------------------------------------------------

def _q4k_scale_unpack(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """GGML get_scale_min_k4: [..., 12] packed bytes -> 6-bit sc, mn
    [..., 8] each."""
    s = scales.astype(np.uint8)
    sc = np.empty(s.shape[:-1] + (8,), np.uint8)
    mn = np.empty_like(sc)
    for j in range(4):
        sc[..., j] = s[..., j] & 63
        mn[..., j] = s[..., j + 4] & 63
    for j in range(4, 8):
        sc[..., j] = (s[..., j + 4] & 0x0F) | ((s[..., j - 4] >> 6) << 4)
        mn[..., j] = (s[..., j + 4] >> 4) | ((s[..., j] >> 6) << 4)
    return sc, mn


def _q4k_scale_pack(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """Inverse of _q4k_scale_unpack (values must be 6-bit)."""
    sc = sc.astype(np.uint8)
    mn = mn.astype(np.uint8)
    out = np.zeros(sc.shape[:-1] + (12,), np.uint8)
    for j in range(4):
        out[..., j] = (sc[..., j] & 63) | ((sc[..., j + 4] >> 4) << 6)
        out[..., j + 4] = (mn[..., j] & 63) | ((mn[..., j + 4] >> 4) << 6)
        out[..., j + 8] = (sc[..., j + 4] & 0x0F) | ((mn[..., j + 4] & 0x0F) << 4)
    return out


def decode_tensor(raw: np.ndarray, ggml_type: int, shape: tuple[int, ...]):
    """Raw block bytes -> planar oracle dataclass / float array."""
    n = int(np.prod(shape)) if shape else 1
    if ggml_type == GGML_F32:
        return raw.view(np.float32).reshape(shape).copy()
    if ggml_type == GGML_F16:
        return raw.view(np.float16).reshape(shape).astype(np.float32)
    if ggml_type == GGML_BF16:
        import ml_dtypes
        return raw.view(ml_dtypes.bfloat16).reshape(shape).astype(np.float32)

    be, bb = _BLOCK[ggml_type]
    blocks = raw.reshape(n // be, bb)
    lead, k = shape[:-1], shape[-1]

    if ggml_type == GGML_Q8_0:
        d = blocks[:, :2].copy().view(np.float16)[:, 0].astype(np.float32)
        qs = blocks[:, 2:].view(np.int8)
        return q.Q8_0(qs=qs.reshape(shape).copy(),
                      d=d.reshape(*lead, k // 32), shape=shape)

    if ggml_type == GGML_Q4_0:
        d = blocks[:, :2].copy().view(np.float16)[:, 0].astype(np.float32)
        packed = blocks[:, 2:]                    # [nb, 16] lo=i, hi=i+16
        return q.Q4_0(qs=packed.reshape(*lead, k // 2).copy(),
                      d=d.reshape(*lead, k // 32), shape=shape)

    if ggml_type == GGML_Q4_K:
        d = blocks[:, 0:2].copy().view(np.float16)[:, 0].astype(np.float32)
        dmin = blocks[:, 2:4].copy().view(np.float16)[:, 0].astype(np.float32)
        sc, mn = _q4k_scale_unpack(blocks[:, 4:16])      # [nsb, 8]
        qs_wire = blocks[:, 16:144]                       # [nsb, 128]
        # per-64 chunk: byte i of chunk l -> elems 64l+i (lo), 64l+32+i (hi)
        w = qs_wire.reshape(-1, 4, 32)
        vals = np.empty((w.shape[0], 4, 64), np.uint8)
        vals[:, :, :32] = w & 0x0F
        vals[:, :, 32:] = w >> 4
        vals = vals.reshape(-1, 8, 32)                    # [nsb, sub, 32]
        qs = q.pack_nibbles(vals).reshape(*lead, k // 2)
        return q.Q4_K(qs=qs, sc=sc.reshape(*lead, k // 32),
                      mn=mn.reshape(*lead, k // 32),
                      d=d.reshape(*lead, k // 256),
                      dmin=dmin.reshape(*lead, k // 256), shape=shape)

    if ggml_type == GGML_Q6_K:
        return _decode_q6_k(blocks, shape)

    raise ValueError(f"unsupported GGML type {ggml_type}")


def _decode_q6_k(blocks: np.ndarray, shape) -> "q.Q6_K":
    """Q6_K wire blocks -> planar oracle Q6_K (zero-requantize; the fused
    q6_k kernel consumes it directly)."""
    lead, k = shape[:-1], shape[-1]
    nsb = blocks.shape[0]
    ql = blocks[:, :128].reshape(nsb, 2, 64)
    qh = blocks[:, 128:192].reshape(nsb, 2, 32)
    scales = blocks[:, 192:208].view(np.int8).copy()     # [nsb, 16]
    d = blocks[:, 208:210].copy().view(np.float16)[:, 0].astype(np.float32)

    vals = np.empty((nsb, 2, 128), np.uint8)             # 6-bit 0..63
    lo = ql & 0x0F
    hi = ql >> 4
    for i, (src, shift) in enumerate(
            [(lo[:, :, :32], 0), (lo[:, :, 32:], 2),
             (hi[:, :, :32], 4), (hi[:, :, 32:], 6)]):
        bits = ((qh >> shift) & 3).astype(np.uint8)
        vals[:, :, 32 * i:32 * (i + 1)] = src | (bits << 4)
    return q.Q6_K(qs=vals.reshape(shape),
                  sc=scales.reshape(*lead, k // 16),
                  d=d.reshape(*lead, k // 256), shape=shape)


def _dequantize_q6_k(blocks: np.ndarray, shape) -> np.ndarray:
    """Q6_K wire -> float32 (kept for tools that want dense floats)."""
    return q.dequantize_q6_k(_decode_q6_k(blocks, shape))


# ---------------------------------------------------------------------------
# block codecs: planar oracle -> GGML wire (writer / export)
# ---------------------------------------------------------------------------

def encode_tensor(t) -> tuple[np.ndarray, int]:
    """Planar oracle dataclass / float array -> (raw bytes, ggml_type)."""
    if isinstance(t, np.ndarray):
        if t.dtype == np.float16:
            return t.reshape(-1).view(np.uint8), GGML_F16
        return np.ascontiguousarray(t, np.float32).reshape(-1).view(
            np.uint8), GGML_F32

    n = int(np.prod(t.shape))
    if isinstance(t, q.Q8_0):
        nb = n // 32
        out = np.empty((nb, 34), np.uint8)
        out[:, :2] = t.d.reshape(nb, 1).astype(np.float16).view(np.uint8)
        out[:, 2:] = t.qs.reshape(nb, 32).view(np.uint8)
        return out.reshape(-1), GGML_Q8_0

    if isinstance(t, q.Q4_0):
        nb = n // 32
        out = np.empty((nb, 18), np.uint8)
        out[:, :2] = t.d.reshape(nb, 1).astype(np.float16).view(np.uint8)
        out[:, 2:] = t.qs.reshape(nb, 16)
        return out.reshape(-1), GGML_Q4_0

    if isinstance(t, q.Q4_K):
        nsb = n // 256
        out = np.empty((nsb, 144), np.uint8)
        out[:, 0:2] = t.d.reshape(nsb, 1).astype(np.float16).view(np.uint8)
        out[:, 2:4] = t.dmin.reshape(nsb, 1).astype(np.float16).view(
            np.uint8)
        out[:, 4:16] = _q4k_scale_pack(t.sc.reshape(nsb, 8),
                                       t.mn.reshape(nsb, 8))
        vals = q.unpack_nibbles(t.qs.reshape(nsb, 8, 16))  # [nsb, 8, 32]
        v64 = vals.reshape(nsb, 4, 64)
        out[:, 16:144] = (v64[:, :, :32] | (v64[:, :, 32:] << 4)).reshape(
            nsb, 128)
        return out.reshape(-1), GGML_Q4_K

    if isinstance(t, q.Q6_K):
        nsb = n // 256
        out = np.empty((nsb, 210), np.uint8)
        vals = t.qs.reshape(nsb, 2, 4, 32)       # [nsb, half, group, 32]
        lo4 = vals & 0x0F
        hi2 = vals >> 4                           # 2-bit planes
        ql = np.empty((nsb, 2, 64), np.uint8)
        ql[:, :, :32] = lo4[:, :, 0] | (lo4[:, :, 2] << 4)
        ql[:, :, 32:] = lo4[:, :, 1] | (lo4[:, :, 3] << 4)
        qh = (hi2[:, :, 0] | (hi2[:, :, 1] << 2)
              | (hi2[:, :, 2] << 4) | (hi2[:, :, 3] << 6))
        out[:, :128] = ql.reshape(nsb, 128)
        out[:, 128:192] = qh.reshape(nsb, 64)
        out[:, 192:208] = t.sc.reshape(nsb, 16).view(np.uint8)
        out[:, 208:210] = t.d.reshape(nsb, 1).astype(np.float16).view(
            np.uint8)
        return out.reshape(-1), GGML_Q6_K

    raise TypeError(f"cannot encode {type(t)}")


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _write_str(f: BinaryIO, s: str) -> None:
    b = s.encode("utf-8")
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


def _write_value(f: BinaryIO, v: Any) -> None:
    if isinstance(v, bool):
        f.write(struct.pack("<I", _VT_BOOL) + struct.pack("<?", v))
    elif isinstance(v, int):
        f.write(struct.pack("<I", _VT_U32 if 0 <= v < 2 ** 32 else _VT_I64))
        f.write(struct.pack("<I" if 0 <= v < 2 ** 32 else "<q", v))
    elif isinstance(v, float):
        f.write(struct.pack("<I", _VT_F32) + struct.pack("<f", v))
    elif isinstance(v, str):
        f.write(struct.pack("<I", _VT_STR))
        _write_str(f, v)
    elif isinstance(v, (list, tuple)):
        f.write(struct.pack("<I", _VT_ARR))
        if v and isinstance(v[0], str):
            f.write(struct.pack("<IQ", _VT_STR, len(v)))
            for s in v:
                _write_str(f, s)
        elif v and isinstance(v[0], float):
            f.write(struct.pack("<IQ", _VT_F32, len(v)))
            f.write(struct.pack(f"<{len(v)}f", *v))
        else:
            f.write(struct.pack("<IQ", _VT_I32, len(v)))
            f.write(struct.pack(f"<{len(v)}i", *v))
    else:
        raise TypeError(f"cannot write metadata value {type(v)}")


def write_gguf(path: str, tensors: dict[str, Any],
               metadata: dict[str, Any] | None = None) -> None:
    """Write a GGUF v3 file. ``tensors`` values are float arrays or planar
    oracle quant dataclasses (encoded to GGML wire blocks)."""
    metadata = dict(metadata or {})
    align = int(metadata.setdefault(ALIGNMENT_KEY, DEFAULT_ALIGNMENT))

    encoded: dict[str, tuple[np.ndarray, int, tuple[int, ...]]] = {}
    for name, t in tensors.items():
        shape = tuple(t.shape)
        raw, gt = encode_tensor(t)
        encoded[name] = (raw, gt, shape)

    with open(path, "wb") as f:
        f.write(struct.pack("<IIQQ", GGUF_MAGIC, GGUF_VERSION,
                            len(encoded), len(metadata)))
        for k, v in metadata.items():
            _write_str(f, k)
            _write_value(f, v)
        offset = 0
        for name, (raw, gt, shape) in encoded.items():
            _write_str(f, name)
            ne = tuple(reversed(shape))
            f.write(struct.pack("<I", len(ne)))
            f.write(struct.pack(f"<{len(ne)}Q", *ne))
            f.write(struct.pack("<IQ", gt, offset))
            offset += (len(raw) + align - 1) // align * align
        pad = (-f.tell()) % align
        f.write(b"\0" * pad)
        for name, (raw, gt, shape) in encoded.items():
            f.write(raw.tobytes())
            f.write(b"\0" * ((-len(raw)) % align))


# ---------------------------------------------------------------------------
# model assembly: GGUF -> engine params
# ---------------------------------------------------------------------------

# llama.cpp tensor names -> (params key path)
_NAME_MAP = {
    "token_embd.weight": ("embed",),
    "output_norm.weight": ("final_norm",),
    "output.weight": ("lm_head",),
}
_LAYER_MAP = {
    "attn_q.weight": "wq", "attn_k.weight": "wk", "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_gate.weight": "w_gate", "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
    "attn_norm.weight": "attn_norm", "ffn_norm.weight": "mlp_norm",
    "ffn_gate_inp.weight": "router",
    "ffn_gate_exps.weight": "w_gate", "ffn_up_exps.weight": "w_up",
    "ffn_down_exps.weight": "w_down",
}


def config_from_metadata(md: dict[str, Any]):
    """Build a ModelConfig from GGUF llama.* metadata."""
    from ggml_cuda_experiments_tpu.models.config import ModelConfig
    arch = md.get("general.architecture", "llama")
    g = lambda k, d=None: md.get(f"{arch}.{k}", d)
    n_heads = int(g("attention.head_count"))
    dim = int(g("embedding_length"))
    vocab = md.get(f"{arch}.vocab_size")
    if vocab is None:
        toks = md.get("tokenizer.ggml.tokens")
        vocab = len(toks) if toks else 32000
    return ModelConfig(
        name=md.get("general.name", arch),
        vocab_size=int(vocab),
        dim=dim,
        n_layers=int(g("block_count")),
        n_heads=n_heads,
        n_kv_heads=int(g("attention.head_count_kv", n_heads)),
        intermediate=int(g("feed_forward_length")),
        head_dim=int(g("attention.key_length", dim // n_heads)),
        rope_theta=float(g("rope.freq_base", 10000.0)),
        rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        max_seq_len=int(g("context_length", 4096)),
        n_experts=int(g("expert_count", 0)),
        n_active_experts=int(g("expert_used_count", 2)),
    )


def load_gguf(path: str, *, requantize: str | None = None,
              max_layers: int | None = None):
    """Load a llama.cpp GGUF checkpoint -> (params pytree, ModelConfig).

    Quantized linears become device QuantLinear tensors (zero-requantize
    for q4_0/q8_0/q4_k/q6_k — including the Q6_K output/v heads of
    llama.cpp *_K_M files, which run on the fused q6 kernel); float
    tensors are requantized to ``requantize`` when set, else kept dense
    bf16. Norms/embeddings are dense bf16.
    """
    import jax.numpy as jnp
    from ggml_cuda_experiments_tpu.ops.quant_matmul import (
        from_oracle, quantize as dev_quantize)

    gf = read_gguf(path)
    cfg = config_from_metadata(gf.metadata)
    if max_layers is not None:
        cfg = dataclasses.replace(cfg, n_layers=min(cfg.n_layers,
                                                    max_layers))

    def to_param(t, key: str):
        dense_keys = ("attn_norm", "mlp_norm", "final_norm", "embed",
                      "router")
        if isinstance(t, np.ndarray):
            if key in dense_keys:
                return jnp.asarray(t, jnp.bfloat16)
            if requantize and t.ndim == 2:
                return dev_quantize(t.astype(np.float32), requantize)
            return jnp.asarray(t, jnp.bfloat16)
        ql = from_oracle(t)
        return ql

    params: dict[str, Any] = {"layers": [dict() for _ in
                                         range(cfg.n_layers)]}
    for name in gf.tensors:
        if name in _NAME_MAP:
            key = _NAME_MAP[name][0]
            params[key] = to_param(gf.load(name), key)
            continue
        if not name.startswith("blk."):
            continue
        _, idx, rest = name.split(".", 2)
        li = int(idx)
        if li >= cfg.n_layers:
            continue
        key = _LAYER_MAP.get(rest)
        if key is None:
            continue
        params["layers"][li][key] = to_param(gf.load(name), key)

    if "lm_head" not in params and "embed" in params:
        # tied embeddings (llama.cpp omits output.weight then)
        params["lm_head"] = params["embed"]
    return params, cfg
