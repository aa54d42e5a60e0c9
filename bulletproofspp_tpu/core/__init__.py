"""Protocol layer: field/curve ground truth, transcript, arguments, range proofs."""
