"""Shared numpy reference attention for flash-kernel tests."""

import numpy as np


def ref_attention(q, k, v, lengths, scale, starts=None, softcap=0.0):
    """q [B,H,D]; k,v [B,Hkv,S,D] f32; lengths/starts [B] → [B,H,D] f32."""
    b, h, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    rep = h // hkv
    out = np.zeros((b, h, d), np.float32)
    for bi in range(b):
        lo = 0 if starts is None else int(starts[bi])
        hi = int(lengths[bi])
        for hq in range(h):
            kk = k[bi, hq // rep, lo:hi]  # [n, D]
            vv = v[bi, hq // rep, lo:hi]
            sc = kk @ q[bi, hq] * scale
            if softcap:
                sc = np.tanh(sc / softcap) * softcap
            sc = sc - sc.max()
            p = np.exp(sc)
            p /= p.sum()
            out[bi, hq] = p @ vv
    return out
