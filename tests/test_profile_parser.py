"""Unit tests for benchmarks/profile_step.py's HLO attribution parser.

The parser is load-bearing for the perf work (it produced the round-4
corrected attribution and the per-fusion MXU/HBM efficiency table), so
its FLOP accounting is pinned here against hand-computed convolutions
in the three labelings that occur in a train step: forward
(b01f_01io->b01f), weight gradient (relabeled dims), and the
lhs-dilated data gradient / transposed conv (dilation zeros skipped by
the TPU emitter, so effective FLOPs divide by prod(lhs_dilate)).
"""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    'profile_step',
    os.path.join(os.path.dirname(__file__), '..', 'benchmarks',
                 'profile_step.py'))
ps = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ps)

_HLO = """\
HloModule jit_train_step

%fused_computation.1 (param_0.1: bf16[16,128,128,12], param_1.2: bf16[3,3,12,64]) -> bf16[16,128,128,64] {
  %param_0.1 = bf16[16,128,128,12]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %param_1.2 = bf16[3,3,12,64]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  %convolution.1 = bf16[16,128,128,64]{3,2,1,0:T(8,128)(2,1)} convolution(%param_0.1, %param_1.2), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
  ROOT %tanh.9 = bf16[16,128,128,64]{3,2,1,0:T(8,128)(2,1)} tanh(%convolution.1)
}

%fused_computation.2 (param_0.3: bf16[16,128,128,64], param_1.4: bf16[4,4,64,128]) -> bf16[16,128,128,64] {
  %param_0.3 = bf16[16,128,128,64]{3,2,1,0} parameter(0)
  %param_1.4 = bf16[4,4,64,128]{3,2,1,0} parameter(1)
  ROOT %convolution.2 = bf16[16,128,128,64]{3,2,1,0} convolution(%param_0.3, %param_1.4), window={size=4x4 pad=2_2x2_2 lhs_dilate=2x2 rhs_reversal=1x1}, dim_labels=b01f_01oi->b01f
}

ENTRY %main.10 (p0.1: bf16[16,128,128,12], p1.1: bf16[3,3,12,64]) -> bf16[16,128,128,64] {
  %p0.1 = bf16[16,128,128,12]{3,2,1,0} parameter(0)
  %p1.1 = bf16[3,3,12,64]{3,2,1,0} parameter(1)
  %fusion.1 = bf16[16,128,128,64]{3,2,1,0} fusion(%p0.1, %p1.1), kind=kOutput, calls=%fused_computation.1
  %copy.5 = bf16[16,128,128,64]{3,0,2,1} copy(%fusion.1)
  ROOT %fusion.2 = bf16[16,128,128,64]{3,2,1,0} fusion(%copy.5, %p1.1), kind=kOutput, calls=%fused_computation.2
}
"""


def test_parse_computations_and_entry_ops():
    bodies, entry_ops = ps.parse_hlo_computations(_HLO)
    assert 'fused_computation.1' in bodies
    assert entry_ops['fusion.1'] == ('fusion', 'fused_computation.1')
    assert entry_ops['copy.5'][0] == 'copy'


def test_forward_conv_flops_exact():
    bodies, _ = ps.parse_hlo_computations(_HLO)
    shapes = ps.collect_shapes(_HLO.splitlines())
    flops = ps.conv_flops_in_body(bodies['fused_computation.1'], shapes)
    # 2 * prod(out 16x128x128x64) * contraction (3*3*12)
    assert flops == 2 * 16 * 128 * 128 * 64 * (3 * 3 * 12)


def test_dilated_dgrad_conv_flops_divide_by_dilation():
    bodies, _ = ps.parse_hlo_computations(_HLO)
    shapes = ps.collect_shapes(_HLO.splitlines())
    flops = ps.conv_flops_in_body(bodies['fused_computation.2'], shapes)
    # dim_labels rhs spec 01oi over [4,4,64,128]: contraction excludes
    # the 'o' dim (64) -> 4*4*128; lhs_dilate=2x2 divides by 4
    assert flops == 2 * 16 * 128 * 128 * 64 * (4 * 4 * 128) // 4


def test_categorize_by_own_opcode_not_operand_names():
    bodies, entry_ops = ps.parse_hlo_computations(_HLO)
    # the round-4 regression: a conv fusion whose OPERAND is %copy.5
    # must categorise as convolution, not copy
    name = ('%fusion.2 = bf16[16,128,128,64]{3,2,1,0} fusion(%copy.5, '
            '%p1.1), kind=kOutput, calls=%fused_computation.2')
    assert ps.categorize(name, entry_ops, bodies).startswith('convolution')
    copy_name = '%copy.5 = bf16[16,128,128,64]{3,0,2,1} copy(%fusion.1)'
    assert ps.categorize(copy_name, entry_ops, bodies) == 'copy/transpose'


def test_op_bytes_sums_all_shape_literals():
    name = ('%fusion.2 = bf16[16,128,128,64]{3,2,1,0} fusion(%copy.5), '
            'kind=kOutput, calls=%fused_computation.2')
    # only the output shape literal appears in this text
    assert ps.op_bytes(name) == 16 * 128 * 128 * 64 * 2
