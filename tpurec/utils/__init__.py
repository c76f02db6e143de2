from tpurec.utils.logging import JsonlLogger
