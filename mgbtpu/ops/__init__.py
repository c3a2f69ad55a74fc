from .blockdiag import BlockDiagHost, extract_block_diag, block_column_sparse

__all__ = ["BlockDiagHost", "extract_block_diag", "block_column_sparse"]
