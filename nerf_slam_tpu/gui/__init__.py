from .headless import HeadlessGui, backproject_packet, write_ply  # noqa
