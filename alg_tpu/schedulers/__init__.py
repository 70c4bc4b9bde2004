from alg_tpu.schedulers.ddim_cogvideox import (
    CogVideoXDDIMConfig,
    CogVideoXDDIMPlan,
    make_ddim_plan,
    ddim_step,
)
from alg_tpu.schedulers.dpm_cogvideox import (
    CogVideoXDPMPlan,
    make_dpm_plan,
    dpm_step,
)
from alg_tpu.schedulers.flow_match_euler import (
    FlowMatchEulerConfig,
    FlowMatchEulerPlan,
    make_flow_match_euler_plan,
    flow_match_euler_step,
)
from alg_tpu.schedulers.unipc import (
    UniPCConfig,
    UniPCPlan,
    UniPCState,
    make_unipc_plan,
    unipc_init_state,
    unipc_step,
)

__all__ = [
    "CogVideoXDDIMConfig",
    "CogVideoXDDIMPlan",
    "make_ddim_plan",
    "ddim_step",
    "CogVideoXDPMPlan",
    "make_dpm_plan",
    "dpm_step",
    "FlowMatchEulerConfig",
    "FlowMatchEulerPlan",
    "make_flow_match_euler_plan",
    "flow_match_euler_step",
    "UniPCConfig",
    "UniPCPlan",
    "UniPCState",
    "make_unipc_plan",
    "unipc_init_state",
    "unipc_step",
]
