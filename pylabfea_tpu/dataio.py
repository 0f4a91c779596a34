"""Data import & analysis for micromechanical test databases.

Reads JSON databases following the modular materials data schema (legacy
``Results`` S11.. arrays or the new ``stress``/``total_strain``/
``plastic_strain`` sub-dicts), detects the elastic-plastic transition,
reconstructs plastic strains when absent, fits the elastic stiffness tensor,
and assembles the ``mat_data`` dictionary that defines ML materials.

Contract follows the reference ``pylabfea.data``
(/root/reference/src/pylabfea/data.py); stress/strain assembly and the
plastic-strain reconstruction are vectorized.
"""
import json
import os
import random
import warnings

import numpy as np
from scipy.signal import savgol_filter
from scipy.optimize import minimize

from pylabfea_tpu.core.tensors import sig_eq_j2, eps_eq, sig_polar_ang, \
    sig_princ2cyl as sig_princ2cyl_single


def ln_strain(eng):
    """Engineering -> logarithmic strain (guarded against eng <= -1)."""
    h2 = np.maximum(1. + np.asarray(eng, dtype=float), 1.e-10)
    return np.log(h2)


def eng_strain(ln):
    """Logarithmic -> engineering strain."""
    return np.exp(np.asarray(ln, dtype=float)) - 1.


def interpolate_stress(s0, s1, e0, e1, et):
    """Linear interpolation of stress between two strain samples."""
    return s0 + (et - e0) * (s1 - s0) / (e1 - e0)


def find_transition_index(stress):
    """Index of the elastic->plastic transition along one load path: smooth
    with Savitzky-Golay filters, then find where the second derivative of the
    equivalent stress departs from its elastic-regime level."""
    stress = np.asarray(stress, dtype=float)
    nst = len(stress)
    wl1 = max(5, nst // 10)
    wl2 = max(2, nst // 50)
    d2 = savgol_filter(
        savgol_filter(stress, window_length=wl1, polyorder=1, deriv=1),
        window_length=wl2, polyorder=1, deriv=1)
    # block means of the second derivative over consecutive windows of
    # width wl2, starting at 10% of the path; the first window sets the
    # elastic-regime tolerance, the last window is never a candidate
    # (window count and 1.2x threshold are the goldens' contract)
    i0 = nst // 10
    nwin = (nst - i0) // wl2
    if nwin > 2:
        means = d2[i0:i0 + nwin * wl2].reshape(nwin, wl2).mean(axis=1)
        hits = np.flatnonzero(np.abs(means[1:nwin - 1]) > means[0] * 1.2)
        if hits.size:
            return i0 + (int(hits[0]) + 1) * wl2
    print('Warning: Transition not determined properly')
    return i0


def get_elastic_coefficients(eps, sig, method='least_square',
                             initial_guess=None):
    """Fit the symmetric 6x6 stiffness matrix to stress-strain pairs, either
    by direct least squares over the 21 independent coefficients or by
    Cholesky-parameterized optimization with a positive-definiteness penalty."""

    iu = np.triu_indices(6)

    def map_flat_to_matrix(C_flat):
        C = np.zeros((6, 6))
        C[iu] = C_flat
        C[(iu[1], iu[0])] = C_flat
        return C

    def map_flat_to_L_and_C(C_flat):
        L = np.zeros((6, 6))
        L[np.tril_indices(6)] = C_flat
        return L, L @ L.T

    def is_positive_definite(C):
        return np.all(np.linalg.eigvals(C) > 0)

    def objective_function(x_flat, data_pairs, penalty_weight=1e9,
                           lambda_reg=1e-3):
        _, C = map_flat_to_L_and_C(x_flat)
        penalty = 0.
        if not is_positive_definite(C):
            penalty = penalty_weight * np.sum(
                np.min(np.linalg.eigvals(C), 0) ** 2)
        ssr = 0.
        for strain, observed in data_pairs:
            ssr += np.sum((observed - C @ np.asarray(strain)) ** 2)
        return ssr + penalty + lambda_reg * np.sum(x_flat ** 2)

    def least_square(data_pairs, random_pairs_number=100):
        # row r of C contributes one equation per pair: sig_r = C[r,:] @ eps.
        # Design matrix columns are the 21 upper-triangle coefficients.
        if random_pairs_number > len(data_pairs):
            random_pairs_number = len(data_pairs)
        pairs = random.sample(data_pairs, random_pairs_number)
        colmap = np.zeros((6, 6), dtype=int)
        colmap[iu] = np.arange(21)
        colmap[(iu[1], iu[0])] = colmap[iu]
        npairs = len(pairs)
        A = np.zeros((npairs * 6, 21))
        b = np.zeros(npairs * 6)
        row = 0
        for strains, stresses in pairs:
            strains = np.asarray(strains, dtype=float)
            for r in range(6):
                A[row, colmap[r]] += strains  # += folds duplicate columns
                b[row] = stresses[r]
                row += 1
        C_flat, *_ = np.linalg.lstsq(A, b, rcond=None)
        return map_flat_to_matrix(C_flat)

    data_pairs = list(zip(eps, sig))
    max_attempts = 50
    attempts = 0
    success = False
    optimized_C = None
    while attempts < max_attempts and not success:
        if method == 'least_square':
            optimized_C = least_square(data_pairs,
                                       random_pairs_number=len(data_pairs))
            success = True
        elif method == 'decomposition':
            guess = initial_guess if initial_guess is not None \
                else np.random.rand(21)
            result = minimize(objective_function, guess, args=(data_pairs,),
                              method='L-BFGS-B')
            if result.success:
                success = True
                _, optimized_C = map_flat_to_L_and_C(result.x)
            else:
                attempts += 1
        else:
            raise ValueError("Invalid method selected. Choose 'least_square' "
                             "or 'decomposition'.")
    if not success:
        print(f'Optimization of material stiffness matrix failed after '
              f'{max_attempts} attempts')
    return np.array(optimized_C)


_COMP_ORDER = ('11', '22', '33', '23', '13', '12')


def _tensor_from_subdict(d):
    """Assemble (N,6) arrays from {'s11': [...], ...}-style sub-dicts."""
    tens = [1] * 6
    for ind, vals in d.items():
        for k, comp in enumerate(_COMP_ORDER):
            if comp in ind:
                tens[k] = vals
                break
    return np.array(tens).T


class Data(object):
    """Handle data from virtual/physical mechanical tests for training ML
    flow rules.  ``source`` is a JSON filename, a pre-read dict, or a legacy
    array of yield stresses; results are collected in ``mat_data``."""

    def __init__(self, source, path_data='./', name='Dataset',
                 mat_name="Simulanium", sdim=6, epl_crit=None, epl_start=None,
                 epl_max=None, depl=0., plot=False, wh_data=True,
                 tx_data=False, texture_name='Random', tx_descriptor='GSH_3',
                 mode='RS'):
        if sdim != 3 and sdim != 6:
            raise ValueError('Value of sdim must be either 3 or 6')
        self.lc_data = None
        self.mat_data = dict()
        self.mat_data['epc'] = epl_crit
        self.mat_data['ep_start'] = epl_start
        self.mat_data['ep_max'] = epl_max
        self.mat_data['delta_ep'] = depl
        self.mat_data['sdim'] = sdim
        self.mat_data['tdim'] = 0
        self.mat_data['Name'] = mat_name
        self.mat_data['Dataset'] = name
        self.mat_data['wh_data'] = wh_data
        self.mat_data['tx_data'] = tx_data
        self.mat_data['Ntext'] = 1
        self.mat_data['tx_name'] = texture_name
        self.mat_data['tx_index'] = 0
        self.mat_data['texture'] = np.zeros(1)
        self.mat_data['tx_descriptor'] = tx_descriptor
        self.mat_data['tx_key'] = None
        self.mode = mode

        if isinstance(source, str):
            self.lc_data = self.read_data(os.path.join(path_data, source))
            self.parse_data(epl_crit, epl_start, epl_max, depl)
        elif isinstance(source, dict):
            self.lc_data = source
            self.parse_data(epl_crit, epl_start, epl_max, depl)
        elif isinstance(source, (list, np.ndarray)):
            print('WARNING: This data type will be no longer supported.')
            self.convert_data(np.array(source))
        else:
            raise ValueError('Only sources of type "str" or "dict" are '
                             'supported.')
        if plot:  # pragma: no cover
            self.plot_training_data()

    def key_parser(self, key):
        """Decode a load-case key into its descriptor fields."""
        p = key.split('_')
        if self.mode == 'RS':
            return {"Stress_Type": p[0], "Load_Type": p[1], "Hash_Load": p[2],
                    "Hash_Orientation": p[3], "Texture_Type": p[4]}
        if self.mode == 'JS':
            return {"Stress_Type": p[0], "Load_Type": p[1], "Hash_Load": p[2],
                    "Hash_Orientation": p[5], "Texture_Type": p[7],
                    "N_Grains": p[3], "Elements_Grain": p[4]}
        raise KeyError(f"Mode is: {self.mode}. Must be RS or JS")

    def add_data(self, data_file, path_data='./'):
        """Merge another data file into this set and re-parse."""
        new_data = self.read_data(os.path.join(path_data, data_file))
        self.lc_data.update(new_data)
        self.parse_data(self.mat_data['epc'], self.mat_data['ep_start'],
                        self.mat_data['ep_max'], self.mat_data['delta_ep'])

    def write_info(self, data):
        if "identifier" not in data.keys():
            return
        if "input_path" in data.keys():
            print(f'Input path for data set {data["identifier"]}: '
                  f'{data["input_path"]}')
        if "load_case" in data.keys():
            print(f'Load case: {data["load_case"]}')

    def read_data(self, data_file):
        """Read a JSON database into per-load-case stress/strain arrays.
        Handles the legacy 'Results' format and the new schema, texture
        descriptor blocks (GSH/ADV), unit conversion, 'cyl' yield-onset-only
        records, and plastic-strain reconstruction from the fitted compliance
        when plastic strains are absent."""
        print("Reading data from", data_file)
        data = json.load(open(data_file))
        final = dict()
        elstrain = []
        elstress = []
        e_plastic = False
        for num, (key, val) in enumerate(data.items()):
            if key == 'Texture':
                self.mat_data['tx_name'] = val['name']
                try:
                    self.mat_data['tx_index'] = val['texture_index']
                except KeyError:
                    print("No texture_index found in this Data_Base.json -> "
                          "Assign default value of 0")
                if not self.mat_data['tx_data']:
                    warnings.warn("tx_data was set to false. Only qualitative "
                                  "texture info is included.")
                else:
                    td = self.mat_data['tx_descriptor']
                    if 'GSH' in td:
                        gsh_dim = int(td.split('_')[-1])
                        if gsh_dim in [3, 7, 12, 37]:
                            self.mat_data['texture'] = np.array(
                                val['gsh_coeff_reconstructed_random']
                            )[1:1 + gsh_dim]
                        else:
                            raise ValueError(f"GSH with {gsh_dim} not valid. "
                                             "Must be 3, 7, 12 or 37")
                    elif 'ADV' in td:
                        adv_dim = int(td.split('_')[-1])
                        self.mat_data['texture'] = np.array(
                            val[f'address_vector_{adv_dim}'])
                    elif td == 'VF':
                        raise NotImplementedError
                    self.mat_data['tdim'] = len(self.mat_data['texture'])
                continue

            if 'Results' in val.keys():
                if 'cyl' in key:
                    final[key] = {"Stress": val['Results']}
                    continue
                res = val['Results']
                c3 = '32' if self.mode == 'JS' else '23'
                stresses = np.array([res["S11"], res["S22"], res["S33"],
                                     res["S" + c3], res["S13"], res["S12"]]).T
                seq_full = sig_eq_j2(stresses)
                tstrain = np.array([res["E11"], res["E22"], res["E33"],
                                    res["E" + c3], res["E13"], res["E12"]]).T
                teeq_full = eps_eq(tstrain)
                if "Ep11" in res.keys():
                    pstrain = np.array([res["Ep11"], res["Ep22"], res["Ep33"],
                                        res["Ep" + c3], res["Ep13"],
                                        res["Ep12"]]).T
                    peeq_pl = eps_eq(pstrain)
                    e_plastic = True
                else:
                    it = find_transition_index(seq_full)
                    if it < 10:
                        continue
                    it = int(it * 0.9)
                    elstrain.append(tstrain[it, :])
                    elstress.append(stresses[it, :])
                    pstrain = None
                    peeq_pl = None
            else:
                stresses = _tensor_from_subdict(val['stress'])
                if "units" in val.keys():
                    unit = val['units']['Stress']
                    if unit == 'MPa':
                        sfct = 1.
                    elif unit == 'GPa':
                        sfct = 1000.
                    else:
                        raise ValueError(f"Cannot convert stress unit {unit}. "
                                         "Data must be in MPa or GPa.")
                else:
                    sfct = 1.
                    print('Warning: No units for stresses are given. '
                          'Assuming MPa.')
                stresses = stresses * sfct
                seq_full = sig_eq_j2(stresses)
                tstrain = _tensor_from_subdict(val['total_strain'])
                teeq_full = eps_eq(tstrain)
                if "plastic_strain" in val.keys():
                    pstrain = _tensor_from_subdict(val['plastic_strain'])
                    peeq_pl = eps_eq(pstrain)
                    e_plastic = True
                else:
                    it = find_transition_index(seq_full)
                    if it < 10:
                        continue
                    it = int(it * 0.9)
                    elstrain.append(tstrain[it, :])
                    elstress.append(stresses[it, :])
                    pstrain = None
                    peeq_pl = None

            final[key] = {"Stress": stresses,
                          "Eq_Stress": seq_full,
                          "Strain_Plastic": pstrain,
                          "Eq_Strain_Plastic": peeq_pl,
                          "Strain_Total": tstrain,
                          "Eq_Strain_Total": teeq_full,
                          "Index": num}
            if "identifier" in val.keys():
                final[key]["identifier"] = val["identifier"]
                if "input_path" in val.keys():
                    final[key]["input_path"] = val["input_path"]
                if "load_case" in val.keys():
                    final[key]["load_case"] = val["load_case"]
                elif "load_case" in val.get("mechanical_BC", [{}])[0].keys():
                    final[key]["load_case"] = \
                        val["mechanical_BC"][0]["load_case"]

        if not e_plastic:
            # reconstruct plastic strains from the fitted compliance
            C = get_elastic_coefficients(elstrain, elstress,
                                         method='least_square')
            SV = np.linalg.inv(C)
            for key, val in final.items():
                stress = val['Stress']
                strain_t = val['Strain_Total']
                el_log = ln_strain(stress @ SV.T)
                pl = eng_strain(ln_strain(strain_t) - el_log)
                final[key]["Strain_Plastic"] = pl
                final[key]["Eq_Strain_Plastic"] = eps_eq(pl)
            print('Plastic strains are reconstructed from linear part of '
                  'stress strain data.')
        return final

    def parse_data(self, epl_crit, epl_start, epl_max, depl):
        """Per load case: locate the yield point, interpolate the ideal yield
        stress at epl_crit, collect flow stresses/plastic strains with
        minimum spacing ``depl``, fit elastic constants, and average the
        yield strength into ``mat_data``."""
        Nlc = len(self.lc_data.keys())
        Ncyl = 0
        peeq_max = 0.
        ct = 0
        ep_c = ep_s = ep_m = 0.0
        sig = []
        epl = []
        sig_ideal = []
        lc_ind_list = np.zeros(Nlc + 1, dtype=int)
        elstrain = []
        elstress = []
        it_list = []
        for key, val in self.lc_data.items():
            if 'cyl' in key:
                Ncyl += 1
                ct += 1
                sig_ideal.append(val['Stress'])
                continue
            it = find_transition_index(val["Eq_Stress"])
            elstrain.append(val['Strain_Total'][it] - val['Strain_Plastic'][it])
            elstress.append(val['Stress'][it])
            peeq = val['Eq_Strain_Plastic']
            if epl_crit is None:
                epc_lc = max(peeq[it] * 1.1, 0.002)
                if epl_start is not None and epl_start > epc_lc:
                    raise ValueError(f'Value of epl_start={epl_start} is '
                                     f'larger than epl_crit={epc_lc}.')
            else:
                epc_lc = epl_crit
            if epl_start is None:
                eps_lc = peeq[it]
            else:
                eps_lc = epl_start
                if epl_start > epc_lc:
                    raise ValueError(f'Value of epl_start={epl_start} is '
                                     f'larger than epl_crit={epc_lc}.')
            epm_lc = max(peeq) if epl_max is None else epl_max

            i_ideal = np.nonzero(peeq <= epc_lc)[0]
            if len(i_ideal) < 2:
                print(f'Skipping data set {key} (No {ct}): No elastic range '
                      'before yield onset.')
                self.write_info(val)
                Nlc -= 1
                continue
            if len(i_ideal) >= len(peeq) - 2:
                print(f'Skipping data set {key} (No {ct}): Plastic range '
                      'after yield onset not sufficient.')
                self.write_info(val)
                Nlc -= 1
                continue
            iel = np.nonzero(peeq <= eps_lc)[0]
            ipl = np.nonzero(np.logical_and(peeq > eps_lc, peeq <= epm_lc))[0]
            if len(iel) < 2:
                print(f'Skipping data set {key} (No {ct}): No elastic range')
                self.write_info(val)
                Nlc -= 1
                continue
            if len(ipl) < 2:
                print(f'Skipping data set {key} (No {ct}): No plastic range')
                self.write_info(val)
                Nlc -= 1
                continue
            it_list.append([it, int(i_ideal[-1]), int(iel[-1]), int(ipl[0])])
            ep_c += epc_lc
            ep_s += eps_lc
            ep_m += epm_lc

            idx = i_ideal[-1]
            s_crit = interpolate_stress(s0=val['Eq_Stress'][idx],
                                        s1=val['Eq_Stress'][idx + 1],
                                        e0=peeq[idx], e1=peeq[idx + 1],
                                        et=epc_lc)
            sig_ideal.append(val['Stress'][idx] * s_crit /
                             sig_eq_j2(val['Stress'][idx]))
            if peeq[ipl[-1]] > peeq_max:
                peeq_max = peeq[ipl[-1]]

            # enforce minimum spacing depl between samples; shift plastic
            # strains to zero at yield onset
            eps_prev = -depl
            nv = 0
            for i in ipl:
                hh = peeq[i]
                if hh >= eps_prev + depl:
                    sig.append(val['Stress'][i])
                    sc_epl = max(0., 1. - epc_lc / hh)
                    epl.append(val['Strain_Plastic'][i] * sc_epl)
                    eps_prev = hh
                    nv += 1
            nonzero = np.nonzero(lc_ind_list)[0]
            prev_idx = lc_ind_list[nonzero[-1]] if nonzero.size > 0 else 0
            lc_ind_list[ct] = nv + prev_idx
            if self.mode == 'JS':
                parsed = self.key_parser(key)
                self.mat_data['tx_key'] = parsed["Hash_Orientation"]
            else:
                self.mat_data['ms_type'] = 'unknown'
                self.mat_data['tx_key'] = 'unknown'
            ct += 1

        if Nlc - Ncyl == 0:
            raise ValueError(
                'parse_data: no usable load cases — every non-cyl record was '
                'skipped as short or degenerate; check epl_crit/epl_start '
                'against the data resolution.')
        C = get_elastic_coefficients(elstrain, elstress, method='least_square')
        sy_av = np.mean(sig_eq_j2(np.array(sig_ideal)))
        self.mat_data['flow_stress'] = np.array(sig)
        self.mat_data['plastic_strain'] = np.array(epl)
        self.mat_data['lc_indices'] = lc_ind_list
        self.mat_data['epc'] = ep_c / (Nlc - Ncyl)
        self.mat_data['ep_start'] = ep_s / (Nlc - Ncyl)
        self.mat_data['ep_max'] = ep_m / (Nlc - Ncyl)
        self.mat_data['peeq_max'] = peeq_max - ep_c / (Nlc - Ncyl)
        self.mat_data['elast_const'] = C
        self.mat_data['sy_av'] = sy_av
        self.mat_data['Nlc'] = Nlc
        self.mat_data['Ncyl'] = Ncyl
        self.mat_data['sig_ideal'] = np.array(sig_ideal)
        self.mat_data['elstress'] = elstress
        self.mat_data['elstrain'] = elstrain
        self.mat_data['transition_ind'] = it_list
        print(f'\n###   Data set: {self.mat_data["Name"]}  ###')
        print(f'Estimated elastic constants (in GPa): C={C * 1.E-3}')
        print(f'Estimated yield strength: {sy_av:5.2f} MPa at '
              f'PEEQ = {(ep_s / Nlc):5.3f}')

    def convert_data(self, sig):
        """Build mat_data from yield-onset stress tensors only."""
        Nlc = len(sig)
        sdim = len(sig[0, :])
        if sdim != self.mat_data['sdim']:
            warnings.warn('Warning: dimension of stress in data does not '
                          'agree with parameter sdim. Use value from data.')
        self.mat_data['sig_ideal'] = sig
        self.mat_data['wh_data'] = False
        lc_ind_list = np.linspace(0, Nlc)
        self.mat_data['lc_indices'] = np.append(lc_ind_list, 0.)
        self.mat_data['elast_const'] = None
        self.mat_data['sy_av'] = np.mean(sig_eq_j2(sig))
        self.mat_data['peeq_max'] = 0.0
        self.mat_data['Nlc'] = Nlc
        print(f'\n###   Data set: {self.mat_data["Name"]}  ###')
        print(f'Converted data for {Nlc} stress tensors at yield onset.')
        print('WARNING: Elastic parameters cannot be derived from data.')

    def add2mat_data(self, data_dict, key):
        """Add one load case and re-parse."""
        self.lc_data[key] = data_dict
        self.parse_data(self.mat_data['epc'], self.mat_data['ep_start'],
                        self.mat_data['ep_max'], self.mat_data['delta_ep'])

    # ----------------------
    # plotting
    # ----------------------
    def plot_training_data(self, emax=1):  # pragma: no cover
        for xlabel in ("Total Strain", "Plastic Strain"):
            self.plot_data(self.lc_data, xlabel, "Stress", emax=emax)

    def plot_data(self, data, xlabel, ylabel, emax=None):  # pragma: no cover
        import matplotlib.pyplot as plt
        for key, val in data.items():
            if 'cyl' in key:
                continue
            plt.scatter(val["Strain_Total"], val["Stress"], s=1)
            if emax is not None:
                plt.xlim(0, emax)
            plt.xlabel(xlabel, fontsize=14)
            plt.ylabel(ylabel, fontsize=14)
        plt.show()

    def plot_stress_strain(self, plot_peeq=True, eps_max=0.1, epc=None,
                           fontsize=14, cmap='viridis'):  # pragma: no cover
        import matplotlib.pyplot as plt
        cols = plt.get_cmap(cmap)
        smax = 0.0
        fig = plt.figure()
        for val in self.lc_data.values():
            eeq = eps_eq(val['Strain_Plastic'] if plot_peeq
                         else val['Strain_Total'])
            seq = sig_eq_j2(val['Stress'])
            ind = np.nonzero(eeq <= eps_max)[0]
            idx = np.argmax(seq[ind])
            smax = max(smax, seq[idx])
            col = (sig_polar_ang(val['Stress'][idx]) + np.pi) / (2 * np.pi)
            plt.plot(eeq[ind], seq[ind], color=cols(col))
        if epc is not None:
            plt.plot([epc, epc], [0, smax], '--r')
        plt.xlabel(r'$\epsilon_{eq}$ (.)', fontsize=fontsize)
        plt.ylabel(r'$\sigma_{eq}$ (MPa)', fontsize=fontsize)
        plt.show()
        plt.close(fig=fig)

    def plot_yield_stress(self, show_hist=True, test_data=None, fontsize=14,
                          cmap='viridis'):  # pragma: no cover
        import matplotlib.pyplot as plt
        cols = plt.get_cmap(cmap)
        fig = plt.figure()
        ang = sig_polar_ang(self.mat_data['sig_ideal'])
        seq = sig_eq_j2(self.mat_data['sig_ideal'])
        ind = np.argsort(ang)
        plt.scatter(ang[ind], seq[ind], c=cols((ang[ind] + np.pi) / (2 * np.pi)))
        plt.plot([-np.pi, np.pi], [self.mat_data['sy_av']] * 2, '--k')
        plt.show()
        plt.close(fig)
        if show_hist:
            fig = plt.figure()
            plt.hist(seq, density=True, label="training data")
            if test_data is not None:
                plt.hist(test_data, density=True, label="test data")
            plt.legend(loc='upper left')
            plt.show()
            plt.close(fig)

    def plot_yield_locus(self, mat_data=None, active='flow_stress',
                         scatter=False, data=None, data_label=None,
                         arrow=False, file=None, title=None,
                         fontsize=18):  # pragma: no cover
        """Polar plot of initial yield points contained in the data set."""
        import matplotlib.pyplot as plt
        if mat_data is None:
            mat_data = self.mat_data
        fig, ax = plt.subplots(subplot_kw={'projection': 'polar'},
                               figsize=(15, 8))
        sc, scy = [], []
        stresses = mat_data[active]
        for i in range(len(stresses)):
            cylv = sig_princ2cyl_single(stresses[i])
            sc.append(cylv)
            if active == 'flow_stress':
                ppe = eps_eq(mat_data['plastic_strain'][i])
                if ppe < 0.003:
                    scy.append(cylv)
            else:
                scy.append(cylv)
        scy = np.array(scy if scy else sc)
        ax.scatter(scy[:, 1], scy[:, 0], marker=".", label='yield points')
        if data is not None:
            ax.plot(data[:, 1], data[:, 0], '.r', label=data_label)
        if title:
            ax.set_title(title, fontsize=fontsize)
        ax.legend()
        if file is not None:
            fig.savefig(file + '.pdf', format='pdf', dpi=300)
        plt.show()
        return ax

    def plot_set(self):  # pragma: no cover
        import matplotlib.pyplot as plt
        cmap = plt.get_cmap('viridis', self.mat_data['Nlc'])
        plt.figure(figsize=(18, 7))
        plt.subplot(1, 2, 1)
        for val in self.lc_data.values():
            peeq = eps_eq(val['Strain_Plastic'])
            seq = sig_eq_j2(val['Stress'])
            idx = np.nonzero(peeq <= self.mat_data['ep_max'])[0][-1]
            col = 0.5 * (sig_polar_ang(val['Stress'][idx]) / np.pi + 1)
            plt.plot(peeq[0:idx] * 100, seq[0:idx], color=cmap(col))
        plt.subplot(1, 2, 2)
        ang = sig_polar_ang(self.mat_data['flow_stress'])
        seq = sig_eq_j2(self.mat_data['flow_stress'])
        ind = np.argsort(ang)
        plt.plot(ang[ind], seq[ind], '-k')
        plt.plot([-np.pi, np.pi], [self.mat_data['sy_av']] * 2, '--k')
        plt.show()
