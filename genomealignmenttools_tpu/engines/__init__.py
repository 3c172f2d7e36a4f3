"""Tool engines: host orchestration + device kernels per reference tool."""
