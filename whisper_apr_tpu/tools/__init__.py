"""Model tooling: HF -> .apr conversion (reference: tools/convert.rs)."""
