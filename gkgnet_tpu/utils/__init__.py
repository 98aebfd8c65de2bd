from gkgnet_tpu.utils.logging import get_logger, JsonLogWriter, load_json_log
