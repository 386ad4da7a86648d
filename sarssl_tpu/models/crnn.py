"""CRNN ablation encoders (flax): residual CNN + bidirectional GRU + FC.

Equivalents of reference ``crnn`` / ``crnn_sim`` / ``tcrnn``
(/root/reference/code/common/CRNN.py:130-483): frequency-strided residual
conv blocks collapse the frequency axis, a (bi)GRU models time, and a linear
head projects per-frame features to the embedding dim. NHWC layout; the GRU
runs as an ``nn.RNN``-wrapped scan (time is the sequential axis).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn


class CnnBlock(nn.Module):
    """conv3x3(stride) -> BN -> ReLU -> conv3x3 -> BN [+residual] -> ReLU."""

    planes: int
    f_stride: int = 1
    use_res: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, dtype=self.dtype,
                                       name=name)
        stride = (self.f_stride, 1)
        y = nn.Conv(self.planes, (3, 3), strides=stride, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = bn("bn2")(y)
        if self.use_res:
            res = x
            if x.shape[-1] != self.planes or self.f_stride != 1:
                res = nn.Conv(self.planes, (1, 1), strides=stride,
                              use_bias=False, dtype=self.dtype,
                              name="down_conv")(x)
                res = bn("down_bn")(res)
            y = y + res
        return nn.relu(y)


class BiGRU(nn.Module):
    hidden: int
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (nb, nt, d)
        fwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype), name="fwd")
        out = fwd(x)
        if self.bidirectional:
            bwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype),
                         reverse=True, keep_order=True, name="bwd")
            out = jnp.concatenate([out, bwd(x)], axis=-1)
        return out


class CRNN(nn.Module):
    """Reference ``crnn``: strided residual CNN over (nf, nt), flatten freq,
    (bi)GRU over time, linear to out_dim. Input NHWC (nb, nf, nt, nch);
    output (nb, nt, out_dim)."""

    nf: int = 256
    planes: Sequence[int] = (64, 64, 128, 256, 512)
    f_stride: Sequence[int] = (1, 1, 4, 4, 4)
    res_flag: bool = True
    out_dim: int = 256
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nb = x.shape[0]
        y = CnnBlock(self.planes[0], self.f_stride[0], self.res_flag,
                     self.dtype, name="pre")(x, train)
        for i in range(1, len(self.f_stride)):
            y = CnnBlock(self.planes[i], self.f_stride[i], self.res_flag,
                         self.dtype, name=f"block{i}a")(y, train)
            y = CnnBlock(self.planes[i], 1, self.res_flag, self.dtype,
                         name=f"block{i}b")(y, train)
        # (nb, nf', nt, c) -> (nb, nt, nf'*c)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(nb, y.shape[2], -1)
        ndir = 2 if self.bidirectional else 1
        hid = y.shape[-1] // ndir
        y = BiGRU(hid, self.bidirectional, self.dtype, name="rnn")(y)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(y)


class CRNNSim(nn.Module):
    """Reference ``crnn_sim``: constant-channel conv stack + GRU."""

    conv_chs: int = 64
    nlayers: int = 3
    rnn_hid: int = 256
    out_dim: int = 256
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nb = x.shape[0]
        y = x
        for i in range(self.nlayers):
            y = CnnBlock(self.conv_chs, 2 if i else 1, True, self.dtype,
                         name=f"block{i}")(y, train)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(nb, y.shape[2], -1)
        y = nn.Dense(self.rnn_hid, dtype=self.dtype, name="proj")(y)
        y = BiGRU(self.rnn_hid // (2 if self.bidirectional else 1),
                  self.bidirectional, self.dtype, name="rnn")(y)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(y)


class TCRNN(nn.Module):
    """Reference ``tcrnn``: 1-D time-conv blocks over flattened (nch*nf)
    features + GRU."""

    planes: Sequence[int] = (256, 256, 128)
    out_dim: int = 256
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x NHWC (nb, nf, nt, nch) -> (nb, nt, nf*nch)
        nb, nf, nt, nch = x.shape
        y = jnp.transpose(x, (0, 2, 1, 3)).reshape(nb, nt, nf * nch)
        for i, p in enumerate(self.planes):
            z = nn.Conv(p, (3,), use_bias=False, dtype=self.dtype,
                        name=f"conv{i}a")(y)
            z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}a")(z)
            z = nn.relu(z)
            z = nn.Conv(p, (3,), use_bias=False, dtype=self.dtype,
                        name=f"conv{i}b")(z)
            z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}b")(z)
            if y.shape[-1] != p:
                y = nn.Dense(p, use_bias=False, dtype=self.dtype,
                             name=f"down{i}")(y)
            y = nn.relu(z + y)
        y = BiGRU(self.planes[-1] // (2 if self.bidirectional else 1),
                  self.bidirectional, self.dtype, name="rnn")(y)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(y)


class CausCnnBlock(nn.Module):
    """Time-causal conv block (reference CRNN.py:46-83): each 3x3 conv pads
    time by 2 on the left only (symmetric pad then trailing truncation in the
    reference), so frame t sees at most frames <= t."""

    planes: int
    use_res: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, dtype=self.dtype,
                                       name=name)
        conv = lambda name: nn.Conv(self.planes, (3, 3), use_bias=False,
                                    padding=((1, 1), (2, 0)),
                                    dtype=self.dtype, name=name)
        y = nn.relu(bn("bn1")(conv("conv1")(x)))
        y = bn("bn2")(conv("conv2")(y))
        if self.use_res:
            y = y + x
        return nn.relu(y)


class CauCRNN(nn.Module):
    """Reference ``CauCRNN`` (CRNN.py:301-356): causal conv blocks with
    frequency/time max-pooling, a unidirectional GRU and a tanh head scaled
    by ``max_num_sources`` — the DP-RTF/DOA ablation encoder."""

    conv_chs: int = 64
    rnn_hid: int = 256
    out_dim: int = 512  # 128 * 2 * ratio(2)
    max_num_sources: int = 2
    pools: Sequence[Tuple[int, int]] = ((4, 1), (2, 1), (2, 2), (2, 2), (2, 3))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (nb, nf, nt, nch) NHWC TF map
        nb = x.shape[0]
        y = x
        for i, pool in enumerate(self.pools):
            y = CausCnnBlock(self.conv_chs, use_res=False, dtype=self.dtype,
                             name=f"block{i}")(y, train)
            y = nn.max_pool(y, window_shape=pool, strides=pool)
        # (nb, nf', nt', ch) -> (nb, nt', ch*nf'), channel-major like the
        # reference's NCHW flatten (CRNN.py:350) so a torch weight transfer
        # for the GRU input projection maps feature-for-feature
        y = jnp.transpose(y, (0, 2, 3, 1)).reshape(nb, y.shape[2], -1)
        y = BiGRU(self.rnn_hid, bidirectional=False, dtype=self.dtype,
                  name="rnn")(y)
        y = nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(y)
        return jnp.tanh(y) * self.max_num_sources  # (nb, nt', out_dim)
