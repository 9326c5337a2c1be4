"""populated in later milestones."""
