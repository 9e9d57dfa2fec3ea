"""Compile the reference's own CPU kernels (csrc/cpu/ROIAlign_cpu.cpp,
csrc/cpu/nms_cpu.cpp) into a test-time extension so the *actual* C++
the reference ships — not a re-derivation — can serve as the oracle for
end-to-end model parity (VERDICT r1 item 1).

The sources are compiled from /root/reference in place; only the ~10-line
pybind wrapper below is ours.  The build is cached under
tests/.ref_ext_cache so repeated test runs don't pay the ~1 min compile.
"""

import os
import pathlib

_REF_CSRC = "/root/reference/maskrcnn_benchmark/csrc"
_CACHE = pathlib.Path(__file__).parent / ".ref_ext_cache"

_WRAPPER = """
#include "cpu/vision.h"

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("nms_cpu", &nms_cpu, "reference csrc/cpu/nms_cpu.cpp");
  m.def("roi_align_forward_cpu", &ROIAlign_forward_cpu,
        "reference csrc/cpu/ROIAlign_cpu.cpp");
}
"""

# torch>=2.x dropped the DeprecatedTypeProperties overload that the
# torch-1.4-era `AT_DISPATCH_FLOATING_TYPES(x.type(), ...)` relies on;
# force-included shim restores it so the reference sources compile
# byte-for-byte unmodified.
_COMPAT = """
#pragma once
#include <torch/extension.h>
namespace detail {
inline c10::ScalarType scalar_type(const at::DeprecatedTypeProperties& t) {
  return t.scalarType();
}
}
"""

_mod = None


def load_reference_cpu_ops():
    """Returns the compiled module with .nms_cpu / .roi_align_forward_cpu.

    torch-1.4-era source uses deprecated-but-still-present ATen APIs
    (Tensor::type(), AT_ASSERTM); -Wno-deprecated keeps the log readable.
    """
    global _mod
    if _mod is not None:
        return _mod
    from torch.utils import cpp_extension

    _CACHE.mkdir(exist_ok=True)
    wrapper = _CACHE / "ref_binding.cpp"
    if not wrapper.exists() or wrapper.read_text() != _WRAPPER:
        wrapper.write_text(_WRAPPER)
    compat = _CACHE / "torch2_compat.h"
    if not compat.exists() or compat.read_text() != _COMPAT:
        compat.write_text(_COMPAT)
    _mod = cpp_extension.load(
        name="ref_cpu_ops",
        sources=[
            str(wrapper),
            f"{_REF_CSRC}/cpu/ROIAlign_cpu.cpp",
            f"{_REF_CSRC}/cpu/nms_cpu.cpp",
        ],
        extra_include_paths=[_REF_CSRC],
        extra_cflags=[
            "-O2",
            "-Wno-deprecated-declarations",
            "-include",
            str(compat),
        ],
        build_directory=str(_CACHE),
        verbose=os.environ.get("REF_EXT_VERBOSE", "") == "1",
    )
    return _mod


def roi_align_torch(input, rois, spatial_scale, ph, pw, sampling_ratio):
    """Pure-torch, autograd-differentiable transcription of the
    reference csrc/cpu/ROIAlign_cpu.cpp forward (Caffe2 semantics: no
    coordinate rounding, malformed rois forced 1x1, adaptive ceil grid,
    out-of-range samples contribute zero but still divide the count,
    edge clamping with ly/lx zeroed at the far edge).

    The reference ships NO CPU backward kernel (roi_align_backward is
    CUDA-only), so multi-step CPU training of the reference — the
    trajectory oracle — routes its pooler through this function and
    lets torch autograd derive the exact analytic backward.
    """
    import torch

    N, C, H, W = input.shape
    dt = input.dtype
    outs = []
    for n in range(rois.shape[0]):
        bi = int(rois[n, 0])
        x1 = rois[n, 1] * spatial_scale
        y1 = rois[n, 2] * spatial_scale
        x2 = rois[n, 3] * spatial_scale
        y2 = rois[n, 4] * spatial_scale
        rw = torch.clamp(x2 - x1, min=1.0)
        rh = torch.clamp(y2 - y1, min=1.0)
        bh = rh / ph
        bw = rw / pw
        gh = sampling_ratio if sampling_ratio > 0 else int(
            torch.ceil(rh / ph)
        )
        gw = sampling_ratio if sampling_ratio > 0 else int(
            torch.ceil(rw / pw)
        )
        yy = (
            y1
            + torch.arange(ph, dtype=dt)[:, None] * bh
            + (torch.arange(gh, dtype=dt)[None, :] + 0.5) * bh / gh
        ).reshape(-1)  # [ph*gh]
        xx = (
            x1
            + torch.arange(pw, dtype=dt)[:, None] * bw
            + (torch.arange(gw, dtype=dt)[None, :] + 0.5) * bw / gw
        ).reshape(-1)  # [pw*gw]
        valid = (
            (yy >= -1.0) & (yy <= H)
        )[:, None] & ((xx >= -1.0) & (xx <= W))[None, :]
        y = torch.clamp(yy, min=0.0)
        x = torch.clamp(xx, min=0.0)
        y_low = y.floor().long()
        x_low = x.floor().long()
        top = y_low >= H - 1
        y_low = torch.where(top, torch.full_like(y_low, H - 1), y_low)
        y = torch.where(top, y_low.to(dt), y)
        y_high = torch.clamp(y_low + 1, max=H - 1)
        right = x_low >= W - 1
        x_low = torch.where(right, torch.full_like(x_low, W - 1), x_low)
        x = torch.where(right, x_low.to(dt), x)
        x_high = torch.clamp(x_low + 1, max=W - 1)
        ly = (y - y_low.to(dt))[:, None]
        lx = (x - x_low.to(dt))[None, :]
        hy, hx = 1.0 - ly, 1.0 - lx
        img = input[bi]  # [C, H, W]

        def gather(yi, xi):
            return img[:, yi[:, None].expand(-1, xi.numel()),
                       xi[None, :].expand(yi.numel(), -1)]

        val = (
            hy * hx * gather(y_low, x_low)
            + hy * lx * gather(y_low, x_high)
            + ly * hx * gather(y_high, x_low)
            + ly * lx * gather(y_high, x_high)
        )
        val = val * valid[None].to(dt)
        out = val.reshape(C, ph, gh, pw, gw).sum(dim=(2, 4)) / (gh * gw)
        outs.append(out)
    return torch.stack(outs) if outs else input.new_zeros((0, C, ph, pw))
