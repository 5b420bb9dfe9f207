"""Build output directory for the native (C++) components in csrc/."""
