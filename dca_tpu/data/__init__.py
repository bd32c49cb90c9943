from .adata import AnnData, Raw, read_h5ad, write_h5ad, is_anndata_like
from .io import (
    read_dataset,
    read_text,
    read_any,
    normalize,
    normalize_per_cell,
    filter_genes,
    filter_cells,
    log1p,
    scale,
    read_genelist,
    write_text_matrix,
    read_pickle,
)
from .simulate import simulate_counts, simulation_grid, Simulation

__all__ = [
    "simulate_counts",
    "simulation_grid",
    "Simulation",
    "AnnData",
    "Raw",
    "read_h5ad",
    "write_h5ad",
    "is_anndata_like",
    "read_dataset",
    "read_text",
    "read_any",
    "normalize",
    "normalize_per_cell",
    "filter_genes",
    "filter_cells",
    "log1p",
    "scale",
    "read_genelist",
    "write_text_matrix",
    "read_pickle",
]
