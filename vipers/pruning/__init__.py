from vipers.pruning.masks import (  # noqa: F401
    prunable_paths,
    init_masks,
    apply_masks,
    sparsity_report,
    compute_sparsity_global,
    compute_sparsity_conv,
    compute_sparsity_linear,
    count_parameters,
)
from vipers.pruning.snip import snip_prune  # noqa: F401
from vipers.pruning.magnitude import magnitude_prune  # noqa: F401
from vipers.pruning.masked_optim import masked_updates  # noqa: F401
