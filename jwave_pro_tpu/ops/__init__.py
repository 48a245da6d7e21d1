from .fwt import (
    analysis_step, decompose, fwt, fwt2, fwt3, ifwt, ifwt2, ifwt3, recompose,
    synthesis_step,
)
from .modwt import (
    MAX_DECOMPOSITION_LEVEL, circular_convolve, circular_convolve_adjoint,
    imodwt, modwt, modwt_base_filters, modwt_mra,
)
from .modwt2d import (imodwt2, imodwt3, modwt2, modwt2_mra, modwt3,
                      modwt3_mra)
from .modwpt import (
    imodwpt, imodwpt2, imodwpt3, modwpt, modwpt2,
    modwpt2_basis_reconstruct, modwpt2_best_basis, modwpt2_tree, modwpt3,
    modwpt_basis_reconstruct, modwpt_best_basis, modwpt_mra,
    modwpt_node_path, modwpt_tree,
)
from .wpt import (
    basis_coefficients, basis_coefficients2, basis_reconstruct,
    basis_reconstruct2, best_basis, best_basis2, iwpt, iwpt2, iwpt3,
    log_energy_cost, shannon_entropy_cost, sure_cost, threshold_cost, wpt,
    wpt2, wpt2_tree, wpt3, wpt_tree,
)

__all__ = [
    "analysis_step", "decompose", "fwt", "fwt2", "fwt3", "ifwt", "ifwt2",
    "ifwt3", "recompose", "synthesis_step",
    "MAX_DECOMPOSITION_LEVEL", "circular_convolve",
    "circular_convolve_adjoint", "imodwt", "modwt", "modwt_base_filters",
    "modwt_mra",
    "imodwt2", "modwt2", "modwt2_mra", "imodwt3", "modwt3", "modwt3_mra",
    "imodwpt", "modwpt", "modwpt_basis_reconstruct", "modwpt_best_basis",
    "modwpt_mra", "modwpt_node_path", "modwpt_tree",
    "imodwpt2", "modwpt2", "imodwpt3", "modwpt3",
    "modwpt2_basis_reconstruct",
    "modwpt2_best_basis", "modwpt2_tree",
    "basis_coefficients", "basis_reconstruct", "best_basis", "iwpt", "iwpt2",
    "basis_coefficients2", "basis_reconstruct2", "best_basis2", "wpt2_tree",
    "iwpt3", "log_energy_cost", "shannon_entropy_cost", "sure_cost",
    "threshold_cost", "wpt", "wpt2", "wpt3", "wpt_tree",
]
