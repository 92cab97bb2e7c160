from .minplus import minplus_rows_pallas
